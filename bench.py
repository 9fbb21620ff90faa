#!/usr/bin/env python3
"""Headline benchmark: BN254 G1 MSM throughput per chip (Mpoints/s).

MSM is the dominant cost of Groth16 proving (BASELINE.json north star:
"BN254 MSM Mpoints/s per chip"). The CPU baseline is derived from the
reference's own numbers (BASELINE.md): rapidsnark proves a 58M-constraint
layer-1 circuit in ~60 s on 32 cores; that proof is ~3 G1 MSMs of 58M, one
H-query MSM of ~64M, and one G2 MSM of 58M (~2.5x G1 cost) — roughly
360M G1-point-equivalents/min ~= 6.0 Mpoints/s. vs_baseline = ours / 6.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever jax.devices() provides (the real TPU chip under axon).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from zkpoa_tpu.fields import bn254  # noqa: E402
from zkpoa_tpu.ops import msm as msm_mod  # noqa: E402
from zkpoa_tpu.ops.curve_jax import BN254_G1, scalar_mul_batch  # noqa: E402

CPU_BASELINE_MPOINTS_S = 6.0


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    n = 1 << log_n
    c = 13
    rng = np.random.default_rng(0)

    # --- setup (untimed): n pseudo-random curve points via batched
    # fixed-base scalar mult of G, plus random scalars -------------------
    gen_scalars = rng.integers(1, 2**63, size=n, dtype=np.uint64).tolist()
    base = BN254_G1.encode_jac([bn254.G1_GEN] * n)
    sc_gen = jnp.asarray(msm_mod.scalars_to_limbs(gen_scalars))
    pts_jac = scalar_mul_batch(BN254_G1, base, sc_gen, 64)
    # normalize to affine on host (correct, untimed)
    affine = BN254_G1.decode_jac(pts_jac)
    xs, ys, valid = BN254_G1.encode_affine(affine)

    msm_scalars = [int.from_bytes(rng.bytes(32), "big") % bn254.R for _ in range(n)]
    sc = jnp.asarray(msm_mod.scalars_to_limbs(msm_scalars))

    # --- compile (untimed) ---------------------------------------------
    out = msm_mod.msm_device(BN254_G1, xs, ys, sc, 254, c, point_valid=valid)
    jax.block_until_ready(out)

    # --- timed steady-state ----------------------------------------------
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = msm_mod.msm_device(BN254_G1, xs, ys, sc, 254, c, point_valid=valid)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    # correctness spot-check on a small prefix (host math)
    k_check = 64
    host = None
    for p, s in zip(affine[:k_check], msm_scalars[:k_check]):
        host = bn254.g1_add(host, bn254.g1_mul(p, s))
    dev_small = msm_mod.msm(BN254_G1, affine[:k_check], msm_scalars[:k_check], c=8)
    assert dev_small == host, "MSM correctness check failed"

    mpoints_s = n / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "bn254_g1_msm_throughput_per_chip",
                "value": round(mpoints_s, 4),
                "unit": "Mpoints/s",
                "vs_baseline": round(mpoints_s / CPU_BASELINE_MPOINTS_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
