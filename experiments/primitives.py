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
    from zkpoa_tpu.ops import msm as M
    from zkpoa_tpu.ops.curve_jax import BN254_G1

    n = 1 << log_n
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32))
    ys = jnp.asarray(rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32))
    sc = jnp.asarray(rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32))
    valid = jnp.ones((n,), dtype=bool)
    c = max(8, log_n - 4)

    def make(k):
        @partial(jax.jit, static_argnums=0)
        def run(kk):
            def body(i, acc):
                r = M.msm_impl(BN254_G1, xs, ys, jnp.roll(sc, i, axis=0), 254, c,
                               point_valid=valid)
                return jax.tree.map(lambda a, b: a + b[None], acc,
                                    jax.tree.map(lambda v: v.astype(jnp.uint32), r))
            acc0 = BN254_G1.infinity((1,))
            out = jax.lax.fori_loop(0, kk, body, acc0)
            return out[0].sum()
        return lambda: run(k)

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


ALL = {
    "msm": bench_msm,
    "ntt": bench_ntt,
    "poseidon": bench_poseidon,
    "merkle": bench_merkle,
    "keccak": bench_keccak,
    "pedersen": bench_pedersen,
    "ecdsa": bench_ecdsa,
    "fixed_base": bench_fixed_base,
}


def main():
    names = sys.argv[1:] or list(ALL)
    for name in names:
        try:
            print(json.dumps(ALL[name]()), flush=True)
        except Exception as e:  # keep the lab running past one failure
            print(json.dumps({"metric": name, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
