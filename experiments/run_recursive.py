#!/usr/bin/env python3
"""Recursive-mode end-to-end run on real TPU hardware.

Runs the full protocol with in-snark proof recursion at the reference's
smallest golden scale (1 sig / 1 batch / height 5 — the
tests/1_sigs_1_batches_5_height config): layer-1 batch-ECDSA* proof,
layer-2 verifies it IN-SNARK (residue-witness pairing verifier, ~7M
constraints) + Keccak address + Merkle + sum, layer-3 verifies layer-2
in-snark + Pedersen commitment. Reference spent 3h15m zkey + 1m prove at
19.9M constraints for layer 2 (benchmarks.txt:42-46).

Writes stage timings + constraint counts to RECURSIVE_RUN.json next to the
build dir. Usage: python experiments/run_recursive.py [build_root] [n_sigs]
— n_sigs > 1 at batch size 1 makes layer-3 verify MULTIPLE layer-2 proofs
in-snark (the reference's flagship 4_sigs_2_batches shape,
circuits/layer_three.circom verifyProof loop).
"""

import json
import os
import resource
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.97")
os.environ.setdefault("ZKPOA_VERBOSE", "1")  # stage-level setup/prove logs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/zkpoa_jax"))
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from zkpoa_tpu.pipeline import fixtures  # noqa: E402
from zkpoa_tpu.pipeline.workflow import run_workflow  # noqa: E402


def main():
    build_root = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "build", "recursive_run")
    n_sigs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    os.makedirs(build_root, exist_ok=True)
    sigs = os.path.join(build_root, "sigs.json")
    anon = os.path.join(build_root, "anon.csv")
    fixtures.write_fixtures(n_sigs, sigs, anon, extra=13 - n_sigs)

    t0 = time.time()
    res = run_workflow(
        sigs,
        anon,
        blinding_factor=0xB11DD1E5,
        build_root=build_root,
        ideal_batch_size=1,
        mode="recursive",
        zkey_cache=os.path.join(build_root, "zkeys"),
        tree_height=5,
        resume=os.environ.get("ZKPOA_RESUME", "1") == "1",
    )
    wall = time.time() - t0
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    out = {
        "mode": "recursive",
        "config": f"{n_sigs}_sigs_{n_sigs}_batches_5_height",
        "wall_s": round(wall, 1),
        "peak_rss_gb": round(rss_gb, 2),
        "build_dir": res.build_dir,
        "balance_sum": res.balance_sum,
        "timings": getattr(res, "timings", None),
    }
    path = os.path.join(build_root, "RECURSIVE_RUN.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2, default=str)
    print(json.dumps(out, default=str), flush=True)


if __name__ == "__main__":
    main()
