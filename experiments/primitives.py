#!/usr/bin/env python3
"""Per-primitive benchmark lab — the reference's experiments/ directory
analog (SURVEY.md §2.7: standalone circuits + timing runs per primitive).

Usage:  python experiments/primitives.py [primitive ...]
Primitives: msm ntt poseidon merkle keccak pedersen ecdsa fixed_base
Prints one JSON line per primitive with honest chained-timing numbers
(see bench.py on the axon-tunnel timing protocol).
"""

import json
import sys
import time
from functools import partial

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _diff_time(make_chain, k1=1, k2=4):
    """Per-op seconds via the K-chain difference protocol."""
    f1, fk = make_chain(k1), make_chain(k2)
    np.asarray(f1())
    t0 = time.perf_counter(); np.asarray(f1()); t1 = time.perf_counter() - t0
    np.asarray(fk())
    t0 = time.perf_counter(); np.asarray(fk()); tk = time.perf_counter() - t0
    return max(tk - t1, 1e-9) / (k2 - k1)


def bench_msm(log_n=15):
    """Fused-kernel MSM (ops/msm_pallas) — separate device calls, K-diff
    timing (the chained-fori form crashed the TPU worker; see bench.py)."""
    from zkpoa_tpu.fields import bn254
    from zkpoa_tpu.ops import msm_pallas as M2
    from zkpoa_tpu.ops.curve_jax import BN254_G1

    n = 1 << log_n
    rng = np.random.default_rng(0)
    xs = jnp.broadcast_to(BN254_G1.field.encode([bn254.G1_GEN[0]]), (n, 16)).copy()
    ys = jnp.broadcast_to(BN254_G1.field.encode([bn254.G1_GEN[1]]), (n, 16)).copy()
    valid = jnp.ones((n,), dtype=bool)
    scs = [
        np.asarray(M2.scalars_to_limbs_fast(
            [int.from_bytes(rng.bytes(32), "big") % bn254.R for _ in range(n)]
        ))
        for _ in range(5)
    ]
    rounds = max(M2.plan_msm(s, 254, 11).rounds for s in scs)
    plan = M2.MsmPlan(254, 11, n, rounds)

    def make(k):
        def run():
            r = None
            for i in range(k):
                r = M2.msm_tpu(BN254_G1, xs, ys, scs[i % len(scs)],
                               point_valid=valid, plan=plan)
            return r[0][0]
        return run

    dt = _diff_time(make)
    return {"metric": "msm_g1", "n": n, "ms": round(dt * 1e3, 2),
            "mpoints_s": round(n / dt / 1e6, 3)}


def bench_ntt(log_n=16):
    from zkpoa_tpu.ops.limbs import BN254_FR
    from zkpoa_tpu.ops.ntt import ntt

    n = 1 << log_n
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32))

    def make(k):
        @partial(jax.jit, static_argnums=0)
        def run(kk):
            def body(i, x):
                return ntt(x, inverse=False)
            return jax.lax.fori_loop(0, kk, body, a).sum()
        return lambda: run(k)

    dt = _diff_time(make)
    return {"metric": "ntt_fr", "n": n, "ms": round(dt * 1e3, 2),
            "melems_s": round(n / dt / 1e6, 3)}


def bench_poseidon(log_n=16):
    from zkpoa_tpu.ops import poseidon_jax
    from zkpoa_tpu.ops.limbs import BN254_FR

    n = 1 << log_n
    rng = np.random.default_rng(0)
    l = jnp.asarray(rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32))
    r = jnp.asarray(rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32))

    def make(k):
        @partial(jax.jit, static_argnums=0)
        def run(kk):
            def body(i, x):
                return poseidon_jax.hash2(x, r)
            return jax.lax.fori_loop(0, kk, body, l).sum()
        return lambda: run(k)

    dt = _diff_time(make)
    return {"metric": "poseidon2", "n": n, "ms": round(dt * 1e3, 2),
            "mhashes_s": round(n / dt / 1e6, 3)}


def bench_merkle(height=17):
    from zkpoa_tpu.merkle.tree import MerkleTree

    n = 1 << (height - 1)
    addrs = list(range(2, n + 2))
    bals = list(range(n))
    t0 = time.perf_counter()
    t = MerkleTree.build(addrs, bals, height)
    root = t.root()  # forces the result
    dt = time.perf_counter() - t0
    return {"metric": "merkle_build", "leaves": n, "s": round(dt, 2),
            "mhashes_s": round((2 * n - 1) / dt / 1e6, 3)}


def bench_keccak(log_n=12):
    from zkpoa_tpu.ops import keccak as K

    n = 1 << log_n
    msgs = np.random.default_rng(0).integers(0, 256, size=(n, 64), dtype=np.uint8)
    t0 = time.perf_counter()
    out = K.keccak256_fixed_batch(msgs)
    dt = time.perf_counter() - t0
    return {"metric": "keccak256_64B", "n": n, "s": round(dt, 3),
            "khashes_s": round(n / dt / 1e3, 1)}


def bench_pedersen():
    from zkpoa_tpu.fields import curve25519 as C

    t0 = time.perf_counter()
    for i in range(10):
        C.pedersen_commitment(123456789 + i, 987654321 + i)
    dt = (time.perf_counter() - t0) / 10
    return {"metric": "pedersen_host", "ms": round(dt * 1e3, 2)}


def bench_ecdsa(n=64):
    from zkpoa_tpu.fields import secp256k1 as S
    from zkpoa_tpu.pipeline import fixtures

    entries = fixtures.generate_signatures(n)
    t0 = time.perf_counter()
    from zkpoa_tpu.pipeline.sigs import parse_signatures

    atts = parse_signatures(entries)
    dt = time.perf_counter() - t0
    ok = all(S.ecdsa_star_verify(a.signature) for a in atts[:4])
    return {"metric": "ecdsa_star_parse", "n": n, "s": round(dt, 2), "ok": ok}


def bench_fixed_base(log_n=14):
    from zkpoa_tpu.fields import bn254
    from zkpoa_tpu.ops import curve_jax, msm as M
    from zkpoa_tpu.ops.curve_jax import BN254_G1

    n = 1 << log_n
    rng = np.random.default_rng(0)
    sc = jnp.asarray(rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32))
    t0 = time.perf_counter()
    acc = curve_jax.fixed_base_mul_batch(
        BN254_G1, "bn254_g1", bn254.G1_GEN, bn254.g1_add, sc, 254
    )
    s = np.asarray(acc[0]).sum()
    dt = time.perf_counter() - t0
    return {"metric": "fixed_base_g1", "n": n, "s": round(dt, 2),
            "kmuls_s": round(n / dt / 1e3, 1)}


def bench_groth16_verification():
    """In-snark Groth16 verification — the reference's standalone
    experiments/circuits/groth16_verification.circom (verifyProof(5):
    32,451,349 constraints, 15m compile, 8h zkey on r7a.8xl,
    experiments/scripts/groth16_verification.sh:6-30). Ours: build the
    residue-witness pairing gadget around a self-generated inner proof and
    report constraint count + synthesis time."""
    from zkpoa_tpu.models.gadgets import pairing_gadget as PG
    from zkpoa_tpu.models.r1cs import Circuit
    from zkpoa_tpu.pipeline.sanitize import sanitize
    from zkpoa_tpu.prover import groth16
    from zkpoa_tpu.prover.prove import prove
    from zkpoa_tpu.prover.setup import setup

    inner = Circuit()
    out = inner.public_output()
    x, y = inner.var(31), inner.var(33)
    inner.bind_output(out, inner.mul(x, y) + x)
    r1, w1 = inner.compile()
    pk = setup(r1, seed="exp-g16v")
    proof = prove(pk, r1, w1, seed="exp")
    vk = groth16.VerifyingKey.from_json(pk.vk_json)
    san = sanitize(vk, proof, inner.public_values)
    pvk = PG.PreparedVK.from_sanitized(san)

    t0 = time.perf_counter()
    c = Circuit(check=False)
    sig = lambda regs: tuple(
        PG.fe_from_regs43(c, [c.var(int(v)) for v in regs[i]], [int(v) for v in regs[i]])
        for i in (0, 1)
    )
    negpa = sig(san["negpa"])
    pb = (sig(san["pb"][0]), sig(san["pb"][1]))
    pc = sig(san["pc"])
    pub = [c.var(int(p)) for p in san["pubInput"]]
    PG.groth16_verify_gadget(c, pvk, negpa, pb, pc, pub)
    r1cs, wit = c.compile()
    dt = time.perf_counter() - t0
    assert r1cs.is_satisfied(wit)
    return {"metric": "groth16_verify_in_snark", "constraints": r1cs.n_constraints,
            "synthesis_s": round(dt, 2), "reference_constraints": 32_451_349}


def bench_membership(height=24, n_members=1):
    """Merkle membership check — the reference's standalone
    experiments/circuits/{merkle,membership}.circom (height-24 Poseidon
    path: 5,856 linear constraints, experiments/scripts/merkle.sh:3).
    Builds the in-circuit Poseidon-Merkle proof verification and reports
    constraint count + synthesis time."""
    from zkpoa_tpu.merkle.tree import MerkleTree
    from zkpoa_tpu.models.gadgets.merkle_gadget import merkle_verify
    from zkpoa_tpu.models.gadgets.poseidon_gadget import poseidon
    from zkpoa_tpu.models.r1cs import Circuit

    n = 1 << min(height - 1, 10)  # small tree, full-height padded paths
    addrs = list(range(2, n + 2))
    bals = [7 * i % 1000 for i in range(n)]
    tree = MerkleTree.build(addrs, bals, height)
    root = tree.root()

    t0 = time.perf_counter()
    c = Circuit()
    root_sig = c.public(root)
    for i in range(n_members):
        pf = tree.prove(i)
        leaf = poseidon(c, [c.var(addrs[i]), c.var(bals[i])])
        merkle_verify(
            c, leaf, root_sig,
            [c.var(int(s)) for s in pf.path_elements],
            [c.var(int(b)) for b in pf.path_indices],
        )
    r1cs, wit = c.compile()
    dt = time.perf_counter() - t0
    assert r1cs.is_satisfied(wit)
    return {"metric": "merkle_membership", "height": height, "members": n_members,
            "constraints": r1cs.n_constraints, "synthesis_s": round(dt, 2),
            "reference_constraints_h24": 5_856}


ALL = {
    "msm": bench_msm,
    "ntt": bench_ntt,
    "poseidon": bench_poseidon,
    "merkle": bench_merkle,
    "keccak": bench_keccak,
    "pedersen": bench_pedersen,
    "ecdsa": bench_ecdsa,
    "fixed_base": bench_fixed_base,
    "groth16_verification": bench_groth16_verification,
    "membership": bench_membership,
}


def main():
    import os

    names = sys.argv[1:] or list(ALL)
    results = []
    for name in names:
        try:
            res = ALL[name]()
        except Exception as e:  # keep the lab running past one failure
            res = {"metric": name, "error": str(e)[:200]}
        results.append(res)
        print(json.dumps(res), flush=True)
    # recorded artifact (the reference keeps its numbers in script
    # headers, experiments/scripts/*.sh:3-35; ours live in one JSON)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "PRIMITIVES.json")
    existing = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                existing = {r["metric"]: r for r in json.load(f)}
        except Exception:
            existing = {}
    for r in results:
        if "error" not in r:
            existing[r["metric"]] = r
    with open(out, "w") as f:
        json.dump(list(existing.values()), f, indent=2)


if __name__ == "__main__":
    main()
