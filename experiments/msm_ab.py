#!/usr/bin/env python3
"""A/B the MSM accumulation paths on hardware: split-gather (ys_ext) vs
packed-XY (one [N,2K] row gather + in-kernel sign), across window widths.

The round-2 measured split at N=2^20 (README Performance notes) put the
grouped accumulation at ~1.7s while the Pallas kernel itself accounts for
~0.15s — the XLA row gathers dominate. Packed XY halves gather rows and
drops the per-MSM ys_ext table build. Wider windows (larger c) cut total
point-visits (N * ceil(254/c)) at the price of a wider reduce.

Usage: python experiments/msm_ab.py [log_n ...]   (default: 17 20)
Writes experiments/MSM_AB.json; correctness exact-checked per config.
"""

import itertools
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from zkpoa_tpu.fields import bn254  # noqa: E402
from zkpoa_tpu.ops import curve_jax, msm_pallas as M2  # noqa: E402
from zkpoa_tpu.ops.curve_jax import BN254_G1  # noqa: E402

GEN_CHUNK = 1 << 18


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def gen_points(n, rng):
    gen_scalars = [int(x) for x in rng.integers(1, 2**63, size=n, dtype=np.uint64)]
    sc_gen = M2.scalars_to_limbs_fast(gen_scalars)
    xs_parts, ys_parts = [], []
    for off in range(0, n, GEN_CHUNK):
        chunk = jnp.asarray(sc_gen[off : off + GEN_CHUNK])
        jac = curve_jax.fixed_base_mul_batch(
            BN254_G1, "bn254_g1", bn254.G1_GEN, bn254.g1_add, chunk, 64
        )
        cx, cy, _ = curve_jax.jac_to_affine_mont(BN254_G1.field, jac)
        xs_parts.append(cx)
        ys_parts.append(cy)
    xs = jnp.concatenate(xs_parts) if len(xs_parts) > 1 else xs_parts[0]
    ys = jnp.concatenate(ys_parts) if len(ys_parts) > 1 else ys_parts[0]
    xs.block_until_ready()
    return xs, ys, gen_scalars


def main():
    log_ns = [int(a) for a in sys.argv[1:]] or [17, 20]
    results = []
    rng = np.random.default_rng(0)
    for log_n in log_ns:
        n = 1 << log_n
        t0 = time.perf_counter()
        xs, ys, gen_scalars = gen_points(n, rng)
        log(f"N=2^{log_n}: point gen {time.perf_counter() - t0:.1f}s")
        scalars = [int.from_bytes(rng.bytes(32), "big") % bn254.R for _ in range(n)]
        sc_dev = jnp.asarray(M2.scalars_to_limbs_fast(scalars))
        sc_dev.block_until_ready()
        expected_k = sum(int(s) * g for s, g in zip(scalars, gen_scalars))
        expected = bn254.g1_mul(bn254.G1_GEN, expected_k % bn254.R)
        valid = jnp.ones((n,), dtype=bool)

        cs = [11, 13] if log_n <= 18 else [11, 13, 15]
        for c, xy in itertools.product(cs, ["1", "0"]):
            os.environ["ZKPOA_MSM_XY"] = xy
            geo = M2.MsmPlan(254, c, n, M2.RG_ROUNDS)
            label = f"N=2^{log_n} c={c} xy={xy}"
            try:
                t0 = time.perf_counter()
                ax, ay, az, ae = M2._msm_device_planned(
                    BN254_G1, geo, M2.RG_ROUNDS, xs, ys, sc_dev, valid)
                res = M2._msm_reduce_stage(BN254_G1, geo, ax, ay, az)
                got = BN254_G1.decode_jac(jax.tree.map(lambda a: a[None], res))[0]
                warm = time.perf_counter() - t0
                # an in-bucket P == Q lane would not be a correctness
                # failure (production detects it via ae and re-runs the
                # unified fallback) — but the flags are OR'd 0/1 per lane,
                # so any count beyond 8*lanes is uninitialized garbage,
                # and random distinct points cannot collide at all: both
                # cases are the kernel being WRONG, not a benign fallback
                n_exc = int(np.asarray(ae, dtype=np.uint64).sum())
                max_flags = 8 * geo.lanes
                ok = got == expected
                exc_plausible = 0 < n_exc <= max_flags
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    ax, ay, az, ae = M2._msm_device_planned(
                        BN254_G1, geo, M2.RG_ROUNDS, xs, ys, sc_dev, valid)
                    res = M2._msm_reduce_stage(BN254_G1, geo, ax, ay, az)
                    np.asarray(jax.tree.leaves(res)[0])
                    times.append(time.perf_counter() - t0)
                per = min(times)
                mps = n / per / 1e6
                if ok:
                    status = "ok"
                elif exc_plausible:
                    # plausible doubling flag: the production contract is
                    # "fallback re-run returns the right answer" — verify
                    # that, don't assume it
                    slow, hp = M2.plan_and_stream(
                        np.asarray(M2.scalars_to_limbs_fast(scalars)),
                        254, c, np.asarray(valid))
                    slow = M2.MsmPlan(slow.n_bits, slow.c, slow.n,
                                      slow.rounds, use_jnp=True)
                    fres, _ = M2._msm_fused(
                        BN254_G1, slow, xs, ys,
                        jnp.zeros((1, 1), jnp.uint32), valid, hp)
                    fgot = BN254_G1.decode_jac(
                        jax.tree.map(lambda a: a[None], fres))[0]
                    status = "fallback" if fgot == expected else "WRONG"
                else:
                    status = "WRONG"
                log(f"{label}: warm {warm:.1f}s best {per:.3f}s "
                    f"{mps:.2f} Mpoints/s correct={ok} exc_lanes={n_exc}")
                results.append({"log_n": log_n, "c": c, "xy": xy == "1",
                                "best_s": round(per, 4),
                                "mpoints_s": round(mps, 3), "correct": bool(ok),
                                "exc_lanes": n_exc, "status": status})
            except Exception as e:  # noqa: BLE001 — record and keep sweeping
                log(f"{label}: FAILED {type(e).__name__}: {e}")
                results.append({"log_n": log_n, "c": c, "xy": xy == "1",
                                "error": f"{type(e).__name__}: {e}"})
        del xs, ys
    out = os.path.join(REPO, "experiments", "MSM_AB.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
