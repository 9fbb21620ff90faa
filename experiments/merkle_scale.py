#!/usr/bin/env python3
"""Merkle engine at scale on real TPU: build a 2^20-leaf Poseidon tree
fully on-device and extract proofs — the reference's Rust merkle-tree
binary needs 2.5 h for 10M leaves (scripts/merkle_tree.rs:3-5; ~15 min
at 2^20 pro-rated, single-thread sequential).

Writes experiments/MERKLE_SCALE.json. Usage:
    python experiments/merkle_scale.py [log2_leaves]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/zkpoa_jax"))
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << log_n
    height = log_n + 1

    import jax
    from zkpoa_tpu.merkle.tree import MerkleTree, verify_proof
    from zkpoa_tpu.ops import poseidon as poseidon_host

    rng = np.random.default_rng(0)
    addrs = np.sort(rng.integers(1, 1 << 62, size=n, dtype=np.int64)).tolist()
    bals = rng.integers(0, 1000, size=n, dtype=np.int64).tolist()

    t0 = time.perf_counter()
    tree = MerkleTree.build(addrs, bals, height)
    jax.block_until_ready(tree._levels[-1])
    t_build_warm = time.perf_counter() - t0

    # second build: steady state (compiles cached)
    t0 = time.perf_counter()
    tree = MerkleTree.build(addrs, bals, height)
    root = tree.root()  # forces completion via the root fetch
    t_build = time.perf_counter() - t0

    # cross-check the root on a small subtree path + proof extraction
    t0 = time.perf_counter()
    proofs = [tree.prove(i) for i in (0, 1, n // 2, n - 1)]
    t_prove = time.perf_counter() - t0
    for p in proofs:
        assert verify_proof(root, p), "proof failed host verification"
    # leaf spot-check against host Poseidon
    assert tree.leaf(0) == poseidon_host.poseidon2(addrs[0], bals[0])

    out = {
        "metric": "merkle_build",
        "leaves": n,
        "height": height,
        "build_s_first": round(t_build_warm, 2),
        "build_s_steady": round(t_build, 2),
        "leaves_per_s": round(n / t_build),
        "prove_4_proofs_s": round(t_prove, 3),
        "reference": "Rust merkle-tree: 2.5h @ 10M leaves (sequential)",
    }
    path = os.path.join(REPO, "experiments", "MERKLE_SCALE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
