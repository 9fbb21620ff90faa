#!/usr/bin/env python3
"""A/B the B2 (G2/Fp2) MSM paths on hardware: packed-plane Pallas
accumulation (round-5) vs the unified-add jnp tree path (round-3/4),
exact-checked against host scalar arithmetic.

The layer-2 recursive prover's measured long pole was the tree-path B2
MSM (~15+ min of the ~45-min 7.24M-constraint prove,
PROGRESS_ROUND4.md); the packed path reuses the shared sorted round
stream and gathers two 16-bit packed coordinate planes.

Usage: python experiments/msm_g2_ab.py [log_n ...]   (default: 16 18)
Writes experiments/MSM_G2_AB.json.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/zkpoa_jax"))
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
from zkpoa_tpu.ops import msm_pallas as M2  # noqa: E402
from zkpoa_tpu.ops.fp2_jax import BN254_G2  # noqa: E402

R = bn254.R


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log_ns = [int(a) for a in sys.argv[1:]] or [16, 18]
    results = []
    rng = np.random.default_rng(5)
    from zkpoa_tpu.prover.setup import _g2_query_device

    for log_n in log_ns:
        n = 1 << log_n
        gen_mults = [int(k) + 1 for k in rng.integers(1, 1 << 30, size=n)]
        t0 = time.time()
        query = _g2_query_device(M2.scalars_to_limbs_fast(gen_mults))
        log(f"N=2^{log_n}: G2 point gen {time.time() - t0:.1f}s")
        scalars = [int.from_bytes(rng.bytes(32), "big") % R for _ in range(n)]
        for i in range(0, (2 * n) // 3):  # witness-like bit values
            scalars[i] = int(rng.integers(0, 2))
        sc = M2.scalars_to_limbs_fast(scalars)
        wplan = M2.plan_witness_msms(sc, jnp.asarray(sc))
        want_k = sum(s * g for s, g in zip(scalars, gen_mults)) % R
        want = bn254.g2_mul(bn254.G2_GEN, want_k) if want_k else None

        for label, env in (("pallas", "1"), ("tree", "0")):
            os.environ["ZKPOA_G2_PALLAS"] = env
            try:
                t0 = time.time()
                got = M2.msm_shared(BN254_G2, query, wplan, bn254.g2_add,
                                    bn254.g2_mul, use_tree=True)
                warm = time.time() - t0
                t0 = time.time()
                got = M2.msm_shared(BN254_G2, query, wplan, bn254.g2_add,
                                    bn254.g2_mul, use_tree=True)
                best = time.time() - t0
                ok = got == want
                log(f"N=2^{log_n} {label}: warm {warm:.1f}s best {best:.3f}s "
                    f"correct={ok}")
                results.append({"log_n": log_n, "path": label,
                                "warm_s": round(warm, 3),
                                "best_s": round(best, 4),
                                "correct": bool(ok)})
            except Exception as e:  # noqa: BLE001 — record and keep sweeping
                log(f"N=2^{log_n} {label}: FAILED {type(e).__name__}: {e}")
                results.append({"log_n": log_n, "path": label,
                                "error": f"{type(e).__name__}: {e}"})
        del query
    os.environ.pop("ZKPOA_G2_PALLAS", None)
    out = os.path.join(REPO, "experiments", "MSM_G2_AB.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
