#!/usr/bin/env python3
"""Stage-level MSM microbenchmark + gather-primitive shootout (hardware).

The round-3 measured split at N=2^20 (README Performance notes) was
digits 29ms / sort ~620ms / accumulation ~1.7s / reduce ~260ms while the
Pallas add kernel itself accounts for ~10ms per 64-round group — i.e. the
XLA row gather feeding the kernel runs at ~12M rows/s (~0.8GB/s effective)
against an 819GB/s HBM. This experiment times each stage in isolation AND
races candidate gather primitives so the round-4 redesign is data-driven:

  g_take_rows     jnp.take of [N,K]u32 rows (production gather, no transpose)
  g_take_tr       take + reshape + transpose to [R,K,L] (production shape)
  g_take_limbmaj  take along axis 1 of a [K,N] limb-major table
  g_take_pad128   take of [N,128]u32 rows (full 512B lane rows)
  g_vmem_pallas   Pallas kernel: table resident in VMEM, per-row dynamic reads
  g_dma_pallas    Pallas kernel: per-row HBM->VMEM DMA gather (double sem)

Writes experiments/MSM_STAGES.json. Usage: msm_stages.py [log_n] [c]
"""

import functools
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from zkpoa_tpu.ops import msm_pallas as M2  # noqa: E402
from zkpoa_tpu.ops.curve_jax import BN254_G1  # noqa: E402

K = 16  # bn254: 16 x 16-bit limbs held in uint32 (limbs.LIMB_BITS = 16)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(out):
    """Force completion with a 4-byte fetch: slice ON DEVICE first — a full
    np.asarray would time the ~25MB/s tunnel transfer, not the op."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[0:1])


def timeit(name, fn, *args, reps=3):
    """Warm (compile) + min-of-reps wall time with a real tiny-fetch sync."""
    t0 = time.perf_counter()
    _sync(fn(*args))
    warm = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    best = min(times)
    log(f"{name:18s} warm {warm:7.2f}s  best {best:8.4f}s")
    return name, warm, best


# --- Pallas gather candidates ------------------------------------------------


def _vmem_gather_kernel(idx_ref, tab_ref, out_ref):
    """Table tile resident in VMEM; gather rows by dynamic index."""
    m = out_ref.shape[0]

    def body(i, _):
        out_ref[i, :] = tab_ref[idx_ref[i], :]
        return 0

    jax.lax.fori_loop(0, m, body, 0)


@functools.partial(jax.jit, static_argnums=(2,))
def vmem_gather(tab, idx, m):
    """tab [T, W] u32 fully VMEM-resident; idx [M] int32; out [M, W]."""
    return pl.pallas_call(
        _vmem_gather_kernel,
        out_shape=jax.ShapeDtypeStruct((m, tab.shape[1]), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, tab)


def _vmem_take_kernel(idx_ref, tab_ref, out_ref):
    """Vectorized in-kernel gather: exercises Mosaic's dynamic-gather
    lowering of jnp.take on VMEM-resident values."""
    out_ref[...] = jnp.take(tab_ref[...], idx_ref[...], axis=0)


@jax.jit
def vmem_take(tab, idx):
    return pl.pallas_call(
        _vmem_take_kernel,
        out_shape=jax.ShapeDtypeStruct((idx.shape[0], tab.shape[1]), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, tab)


def _dma_gather_kernel(idx_ref, tab_hbm, out_ref, buf, sems):
    """Per-row HBM->VMEM DMA, 8-deep pipeline."""
    m = out_ref.shape[0]
    DEPTH = 8

    def start(i):
        return pltpu.make_async_copy(
            tab_hbm.at[idx_ref[i]], buf.at[i % DEPTH], sems.at[i % DEPTH]
        )

    for i in range(DEPTH):
        start(i).start()

    def body(i, _):
        start(i).wait()
        out_ref[i, :] = buf[i % DEPTH]

        @pl.when(i + DEPTH < m)
        def _():
            start(i + DEPTH).start()

        return 0

    jax.lax.fori_loop(0, m, body, 0)


@functools.partial(jax.jit, static_argnums=(2,))
def dma_gather(tab, idx, m):
    w = tab.shape[1]
    return pl.pallas_call(
        _dma_gather_kernel,
        out_shape=jax.ShapeDtypeStruct((m, w), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, w), jnp.uint32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, tab)


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    n = 1 << log_n
    rng = np.random.default_rng(0)
    results = {"log_n": log_n, "c": c}

    geo = M2.MsmPlan(254, c, n, M2.RG_ROUNDS)
    lanes = geo.lanes
    rg = M2.RG_ROUNDS
    m_group = rg * lanes  # rows gathered per accumulation group
    log(f"N=2^{log_n} c={c}: nw={geo.nw} nb={geo.nb} lanes={lanes} "
        f"group rows={m_group}")

    # synthetic operands (content irrelevant for stage timing)
    xs = jnp.asarray(rng.integers(0, 2**32, size=(n, K), dtype=np.uint32))
    scalars = jnp.asarray(
        rng.integers(0, 2**16, size=(n, 16), dtype=np.uint16).astype(np.uint32)
    )
    idx_group = jnp.asarray(rng.integers(0, n, size=(m_group,), dtype=np.int32))
    valid = jnp.ones((n,), dtype=bool)
    xs.block_until_ready()

    recs = []

    # -- production stages ----------------------------------------------------
    recs.append(timeit(
        "digits", jax.jit(lambda s: M2._digits_signed_jnp(s, geo)[0]), scalars))
    recs.append(timeit("plan(sort)", lambda s: M2._plan_dev(geo, s, valid), scalars))

    order_y, b_start, b_end, occ = M2._plan_dev(geo, scalars, valid)
    occ_i = int(occ)
    n_groups = (occ_i + rg - 1) // rg
    results["occupancy"] = occ_i
    results["n_groups"] = n_groups
    log(f"occupancy={occ_i} n_groups={n_groups}")

    # -- gather primitives (one group's volume each) ---------------------------
    recs.append(timeit(
        "g_take_rows", jax.jit(lambda t, i: jnp.take(t, i, axis=0)), xs, idx_group))
    recs.append(timeit(
        "g_take_tr",
        jax.jit(lambda t, i: jnp.transpose(
            jnp.take(t, i, axis=0).reshape(rg, lanes, K), (0, 2, 1))),
        xs, idx_group))
    xsT = xs.T.copy()
    recs.append(timeit(
        "g_take_limbmaj", jax.jit(lambda t, i: jnp.take(t, i, axis=1)), xsT, idx_group))
    xs_pad = jnp.concatenate([xs] * 8, axis=1)  # [N, 128]
    m_pad = max(m_group // 8, 1)
    recs.append(timeit(
        "g_take_pad128", jax.jit(lambda t, i: jnp.take(t, i, axis=0)),
        xs_pad, idx_group[:m_pad]))
    del xs_pad

    # packed-XY production row gather: [N, 2K] rows
    xy = jnp.concatenate([xs, xs], axis=1)
    recs.append(timeit(
        "g_take_xy_rows", jax.jit(lambda t, i: jnp.take(t, i, axis=0)), xy, idx_group))

    # -- Pallas gather candidates ----------------------------------------------
    T_VMEM = 1 << 15  # 32k rows x 64B = 2MB table tile
    m_small = 1 << 15
    tab_small = xs[:T_VMEM]
    idx_small = jnp.asarray(rng.integers(0, T_VMEM, size=(m_small,), dtype=np.int32))
    try:
        recs.append(timeit(
            "g_vmem_pallas", lambda t, i: vmem_gather(t, i, m_small),
            tab_small, idx_small))
    except Exception as e:  # noqa: BLE001
        log(f"g_vmem_pallas FAILED: {type(e).__name__}: {e}")
        results["g_vmem_pallas_error"] = f"{type(e).__name__}: {e}"
    try:
        recs.append(timeit(
            "g_vmem_take", vmem_take, tab_small[: 1 << 13],
            jnp.asarray(rng.integers(0, 1 << 13, size=(1 << 13,), dtype=np.int32))))
    except Exception as e:  # noqa: BLE001
        log(f"g_vmem_take FAILED: {type(e).__name__}: {e}")
        results["g_vmem_take_error"] = f"{type(e).__name__}: {e}"
    try:
        # DMA rows must be 128-lane aligned: table padded to [N, 128]
        m_dma = 1 << 14
        xs_dma = jnp.concatenate([xs[: 1 << 18]] * 8, axis=1)
        recs.append(timeit(
            "g_dma_pallas", lambda t, i: dma_gather(t, i, m_dma),
            xs_dma, jnp.asarray(
                rng.integers(0, 1 << 18, size=(m_dma,), dtype=np.int32))))
        del xs_dma
    except Exception as e:  # noqa: BLE001
        log(f"g_dma_pallas FAILED: {type(e).__name__}: {e}")
        results["g_dma_pallas_error"] = f"{type(e).__name__}: {e}"
    # does index sortedness help XLA's row gather?
    idx_sorted = jnp.sort(idx_group)
    recs.append(timeit(
        "g_take_sorted", jax.jit(lambda t, i: jnp.take(t, i, axis=0)),
        xs, idx_sorted))

    # -- accumulation kernel on pre-gathered data -------------------------------
    px = jnp.take(xs, idx_group, axis=0).reshape(rg, lanes, K).transpose(0, 2, 1)
    py = px
    vstream = jnp.ones((rg, lanes), jnp.uint32)
    px.block_until_ready()
    recs.append(timeit(
        "kernel_64r",
        jax.jit(lambda a, b, v: M2._accumulate(BN254_G1.field, a, b, v, geo)),
        px, py, vstream))

    # -- one full accumulation group (gather + kernel fused as in production) --
    ys_ext = jnp.concatenate([xs, xs], axis=0)
    recs.append(timeit(
        "full_group",
        lambda oy, bs, be: M2._msm_groups_scan(
            BN254_G1, geo, rg, xs, ys_ext, oy, bs, be, jnp.int32(1)),
        order_y, b_start, b_end))

    # -- reduce -----------------------------------------------------------------
    ax = jnp.asarray(rng.integers(0, 2**32, size=(K, lanes), dtype=np.uint32))
    recs.append(timeit(
        "reduce", lambda a: M2._msm_reduce_stage(BN254_G1, geo, a, a, a), ax))

    for name, warm, best in recs:
        results[name] = {"warm_s": round(warm, 3), "best_s": round(best, 5)}
        if name.startswith("g_"):
            m = {"g_take_pad128": m_pad, "g_vmem_pallas": 1 << 15,
                 "g_vmem_take": 1 << 13, "g_dma_pallas": 1 << 14}.get(name, m_group)
            results[name]["mrows_s"] = round(m / best / 1e6, 2)

    out = os.path.join(REPO, "experiments", "MSM_STAGES.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
