"""Fused-kernel MSM (ops/msm_pallas): digit recoding, planning, and full
MSM correctness vs exact host arithmetic.

On the CPU backend the accumulation runs through the jnp reference path
(_accumulate_jnp, identical branchless semantics to the Pallas kernel); the
kernel itself is exercised on TPU hardware by bench.py and the hardware
cross-check in experiments/. Replaces rapidsnark's CPU MSM (reference
scripts/g16_prove.sh:246-252)."""

import os

import numpy as np
import pytest

import tests.conftest as cft  # noqa: F401  (forces CPU platform)
import jax
import jax.numpy as jnp

from zkpoa_tpu.fields import bn254
from zkpoa_tpu.ops import msm as msm_mod
from zkpoa_tpu.ops import msm_pallas as M2
from zkpoa_tpu.ops.curve_jax import BN254_G1


def _host_sum(pts, scalars):
    acc = None
    for p, s in zip(pts, scalars):
        acc = bn254.g1_add(acc, bn254.g1_mul(p, s))
    return acc


@pytest.mark.parametrize("c", [5, 11, 12, 13])
def test_signed_digit_recoding_reconstructs(c):
    rng = np.random.default_rng(7)
    scalars = [int.from_bytes(rng.bytes(32), "big") % bn254.R for _ in range(100)]
    scalars += [0, 1, bn254.R - 1]
    sc = msm_mod.scalars_to_limbs(scalars)
    plan = M2.MsmPlan(254, c, len(scalars), 16)
    slots, signs = M2._digits_signed_np(sc, plan)
    for i, s in enumerate(scalars):
        val = 0
        for w in range(plan.nw):
            sl = int(slots[w, i])
            if sl == 0:
                continue
            if w == plan.nw - 1 and plan.top_block:
                d = (sl - 1) // plan.top_block + 1
                assert (sl - 1) % plan.top_block == i % plan.top_block
                assert d <= plan.top_count
            elif w == plan.nw - 1 and plan.spread > 1:
                d = ((sl - 1) % plan.top_stride) + 1
                assert (sl - 1) // plan.top_stride == i % plan.spread
            else:
                d = sl
                assert d <= plan.nb
            if signs[w, i]:
                d = -d
            val += d << (c * w)
        assert val == s
    # device recoding bit-identical to the host mirror
    sj, gj = M2._digits_signed_jnp(jnp.asarray(sc), plan)
    assert (np.asarray(sj) == slots).all()
    assert (np.asarray(gj) == signs).all()


def test_plan_rounds_cover_occupancy():
    rng = np.random.default_rng(3)
    scalars = [int.from_bytes(rng.bytes(32), "big") % bn254.R for _ in range(256)]
    sc = msm_mod.scalars_to_limbs(scalars)
    plan = M2.plan_msm(sc, 254, 11)
    slots, _ = M2._digits_signed_np(sc, plan)
    for w in range(plan.nw):
        s = slots[w][slots[w] > 0]
        if s.size:
            assert np.bincount(s - 1, minlength=plan.nb).max() <= plan.rounds
    assert plan.rounds % M2.ROUND_GRANULE == 0


def test_top_block_layout_geometry():
    """c=10 at 254 bits activates the balanced-block top window (BN254
    scalars populate only 13 of 16 top digit values; block = 39): the
    digit recoders, native planner, and reduce must agree on the layout."""
    plan = M2.MsmPlan(254, 10, 64, 16)
    assert plan.top_block == plan.nb // plan.top_count and plan.top_block >= 2
    assert plan.top_count == (M2._BN254_R >> (10 * (plan.nw - 1))) + 1
    rng = np.random.default_rng(3)
    scalars = [int.from_bytes(rng.bytes(32), "big") % bn254.R for _ in range(64)]
    sc = np.asarray(msm_mod.scalars_to_limbs(scalars))
    slots, _ = M2._digits_signed_np(sc, plan)
    top = slots[plan.nw - 1]
    top = top[top > 0] - 1
    assert top.max() < plan.top_count * plan.top_block
    # jnp recoder agrees
    sj, _ = M2._digits_signed_jnp(jnp.asarray(sc), plan)
    assert (np.asarray(sj) == slots).all()


@pytest.mark.parametrize("c", [5, 10, 11])
def test_msm_fused_matches_host(c):
    rng = np.random.default_rng(42)
    n = 40
    pts = [bn254.g1_mul(bn254.G1_GEN, int(k) + 1) for k in rng.integers(1, 10**6, size=n)]
    scalars = [int.from_bytes(rng.bytes(32), "big") % bn254.R for _ in range(n)]
    scalars[3] = 0  # zero scalar -> dropped digit everywhere
    pts[5] = pts[4]  # repeated point -> in-bucket double
    scalars[6] = 1
    sc = msm_mod.scalars_to_limbs(scalars)
    xs, ys, valid = BN254_G1.encode_affine(pts)
    res = M2.msm_tpu(BN254_G1, xs, ys, sc, n_bits=254, c=c, point_valid=valid)
    got = BN254_G1.decode_jac(jax.tree.map(lambda a: a[None], res))[0]
    assert got == _host_sum(pts, scalars)


def test_msm_fused_top_window_spread():
    """Scalars living only in the skewed top window exercise the spread
    slots + fold-back path (the round-count killer the old kernel hit:
    2048 rounds instead of ~40 at N=2^17)."""
    rng = np.random.default_rng(9)
    n = 32
    pts = [bn254.g1_mul(bn254.G1_GEN, int(k) + 1) for k in rng.integers(1, 10**6, size=n)]
    scalars = [(int(k) % 3) << 253 for k in rng.integers(0, 3, size=n)]
    sc = msm_mod.scalars_to_limbs(scalars)
    xs, ys, valid = BN254_G1.encode_affine(pts)
    plan = M2.plan_msm(sc, 254, 11)
    assert plan.spread > 1
    res = M2.msm_tpu(BN254_G1, xs, ys, sc, n_bits=254, c=11, point_valid=valid, plan=plan)
    got = BN254_G1.decode_jac(jax.tree.map(lambda a: a[None], res))[0]
    assert got == _host_sum(pts, scalars)


def test_msm_fused_invalid_points_masked():
    rng = np.random.default_rng(5)
    n = 16
    pts = [bn254.g1_mul(bn254.G1_GEN, k + 1) for k in range(n)]
    scalars = [int.from_bytes(rng.bytes(32), "big") % bn254.R for _ in range(n)]
    xs, ys, valid = BN254_G1.encode_affine(pts)
    valid = valid.at[2].set(False).at[9].set(False)
    res = M2.msm_tpu(BN254_G1, xs, ys, msm_mod.scalars_to_limbs(scalars),
                     n_bits=254, c=5, point_valid=valid)
    got = BN254_G1.decode_jac(jax.tree.map(lambda a: a[None], res))[0]
    expect = _host_sum(
        [p for i, p in enumerate(pts) if i not in (2, 9)],
        [s for i, s in enumerate(scalars) if i not in (2, 9)],
    )
    assert got == expect


def test_msm_fused_all_zero_scalars():
    pts = [bn254.g1_mul(bn254.G1_GEN, k + 1) for k in range(8)]
    sc = msm_mod.scalars_to_limbs([0] * 8)
    xs, ys, valid = BN254_G1.encode_affine(pts)
    res = M2.msm_tpu(BN254_G1, xs, ys, sc, n_bits=254, c=5, point_valid=valid)
    got = BN254_G1.decode_jac(jax.tree.map(lambda a: a[None], res))[0]
    assert got is None


def test_msm_host_plan_path_matches():
    """The host-planned stream path (numpy digits/sort, device gathers
    only) must agree with the device-planned path — it's what the prover
    uses above HOST_PLAN_MIN_N, where the device sort's compile stalls."""
    rng = np.random.default_rng(21)
    n = 48
    pts = [bn254.g1_mul(bn254.G1_GEN, int(k) + 1) for k in rng.integers(1, 10**6, size=n)]
    scalars = [int.from_bytes(rng.bytes(32), "big") % bn254.R for _ in range(n)]
    sc = msm_mod.scalars_to_limbs(scalars)
    xs, ys, valid = BN254_G1.encode_affine(pts)
    plan = M2.plan_msm(sc, 254, 5, np.asarray(valid))
    hp = M2._stream_indices_host(plan, sc, np.asarray(valid))
    res, exc = M2._msm_fused(BN254_G1, plan, xs, ys, jnp.asarray(sc), valid, hp)
    got = BN254_G1.decode_jac(jax.tree.map(lambda a: a[None], res))[0]
    assert got == _host_sum(pts, scalars)
    # G2-style tree path through the same host plan (G1 coords as pytree)
    res2 = M2._msm_fused_tree(BN254_G1, plan, xs, ys, jnp.asarray(sc), valid, hp)
    got2 = BN254_G1.decode_jac(jax.tree.map(lambda a: a[None], res2))[0]
    assert got2 == _host_sum(pts, scalars)


def test_witness_plan_shared_tree_matches_heavy_split():
    """ONE shared device plan serving several query tables (the prover's
    a/b1/b2 path): per-query infinity masks apply at accumulation time;
    results must match the per-query heavy-split MSM exactly."""
    rng = np.random.default_rng(21)
    n = 300
    pts = [bn254.g1_mul(bn254.G1_GEN, int(k) + 1)
           for k in rng.integers(1, 10**6, size=n)]
    scalars = [int.from_bytes(rng.bytes(32), "big") % bn254.R for _ in range(n)]
    # heavy repeated values (bit-like wires) + zeros
    for i in range(0, 280, 1):
        scalars[i] = int(rng.integers(0, 2))
    sc = M2.scalars_to_limbs_fast(scalars)
    sc_dev = jnp.asarray(sc)

    import zkpoa_tpu.ops.msm_pallas as MP

    old = MP.HEAVY_COUNT_MIN
    MP.HEAVY_COUNT_MIN = 8
    try:
        wplan = M2.plan_witness_msms(sc, sc_dev, c=5)
        for seed in (0, 1):
            valid = np.ones(n, dtype=bool)
            valid[rng.integers(0, n, size=20)] = False
            xs, ys, _ = BN254_G1.encode_affine(pts)

            class Q:
                pass

            q = Q()
            q.xs, q.ys, q.valid = xs, ys, jnp.asarray(valid)
            got = M2.msm_shared(BN254_G1, q, wplan, bn254.g1_add, bn254.g1_mul,
                                use_tree=True)
            want = M2.msm_tpu_heavy_split(
                BN254_G1, q, sc, bn254.g1_add, bn254.g1_mul, c=5, use_tree=True)
            assert got == want
    finally:
        MP.HEAVY_COUNT_MIN = old


def test_gather_packed_matches_split_gather():
    """The materialized-stream packed gather (one [N, K] row gather,
    x | y<<16 in 16-bit halves, in-kernel sign, zero-row invalidity) must
    produce exactly the stream the split x/ys_ext gather feeds the
    kernel: same x rows, same (sign-applied) y rows, same valid bits."""
    from zkpoa_tpu.ops import limbs as L

    rng = np.random.default_rng(11)
    n, c = 512, 7
    spec = BN254_G1.field
    scalars = [int.from_bytes(rng.bytes(32), "big") % bn254.R for _ in range(n)]
    sc = jnp.asarray(msm_mod.scalars_to_limbs(scalars))
    plan = M2.MsmPlan(254, c, n, 16)
    pv = jnp.ones((n,), dtype=bool)
    order_y, b_start, b_end, occ = M2._plan_dev(plan, sc, pv)
    rg = 8
    rounds = 2 * rg
    # random Montgomery-ish coordinate tables (values only flow through)
    xs = jnp.asarray(rng.integers(0, 2**16, size=(n, spec.n_limbs), dtype=np.uint32))
    ys = jnp.asarray(rng.integers(1, 2**16, size=(n, spec.n_limbs), dtype=np.uint32))
    ys_ext = M2._neg_y_ext(spec, ys)
    q_valid = jnp.asarray(rng.integers(0, 2, size=(n,), dtype=np.uint32).astype(bool))
    xy = M2._pack_xy(xs, ys, q_valid=q_valid)
    idx_enc = M2._materialize_stream(plan, rounds, order_y, b_start, b_end)
    k = spec.n_limbs
    for r0 in [0, rg]:
        px, py, v_old = M2._gather_group_masked(
            BN254_G1, plan, rg, xs, ys_ext, order_y, b_start, b_end,
            q_valid, jnp.int32(r0))
        idx_g = jax.lax.dynamic_slice_in_dim(idx_enc, r0, rg, axis=0)
        pxy, v_new = M2._gather_rows_pk(plan, xy, idx_g)
        # v_old already folds q_valid; the packed path folds it as an
        # all-zero row instead, so: valid_old == valid_new & row_nonzero
        row_nz = (np.asarray(pxy) != 0).any(axis=1)
        v_eff = (np.asarray(v_new) & 1).astype(bool) & row_nz
        assert (v_eff == np.asarray(v_old).astype(bool)).all()
        # where the query point is valid, rows carry the exact coords
        qmask = v_eff.reshape(-1)
        pxf = np.asarray(pxy & 0xFFFF).transpose(0, 2, 1).reshape(-1, k)
        pxo = np.asarray(px).transpose(0, 2, 1).reshape(-1, k)
        assert (pxf[qmask] == pxo[qmask]).all()
        y_raw = jnp.transpose(pxy >> 16, (0, 2, 1)).reshape(-1, k)
        y_neg = L.sub_mod(spec, jnp.zeros_like(y_raw), y_raw)
        sign = ((np.asarray(v_new).reshape(-1) >> 1) & 1).astype(bool)
        y_dec = np.where(sign[:, None], np.asarray(y_neg), np.asarray(y_raw))
        py_flat = np.asarray(jnp.transpose(py, (0, 2, 1)).reshape(-1, k))
        assert (y_dec[qmask] == py_flat[qmask]).all()


@pytest.mark.skipif(
    os.environ.get("ZKPOA_INTERPRET_TESTS") != "1",
    reason="Pallas interpret mode executes these unrolled field kernels "
           ">30min even at toy geometry; kernel exactness is enforced on "
           "hardware end-to-end (bench.py + experiments/msm_ab.py check "
           "the full MSM against host scalar arithmetic on every run)")
def test_packed_kernel_interpret_matches_jnp():
    """Drive the packed-row Pallas kernel itself (unpack + in-kernel sign
    negation + mixed add) in interpret mode and compare the bucket state
    against the unified jnp accumulator on the equivalent split stream —
    the packed kernel body is exactly what production runs on hardware."""
    import functools as ft

    from jax.experimental import pallas as pl
    from zkpoa_tpu.ops import limbs as L

    rng = np.random.default_rng(5)
    # tiny geometry (18-bit scalars, nw=5, nb=8, lanes=40): interpret mode
    # executes the unrolled kernel body per grid step in Python
    n, c = 64, 4
    spec = BN254_G1.field
    k = spec.n_limbs
    scalars = [int(x) for x in rng.integers(1, 1 << 18, size=n, dtype=np.int64)]
    sc = jnp.asarray(msm_mod.scalars_to_limbs(scalars))
    plan = M2.MsmPlan(18, c, n, 8)
    pv = jnp.ones((n,), dtype=bool)
    order_y, b_start, b_end, occ = M2._plan_dev(plan, sc, pv)
    rg = 8
    # REAL curve points so the adds are well-defined group operations
    pts = [bn254.g1_mul(bn254.G1_GEN, int(g)) for g in
           rng.integers(1, 2**30, size=n, dtype=np.int64)]
    xs = spec.encode([p[0] for p in pts])
    ys = spec.encode([p[1] for p in pts])
    xy = M2._pack_xy(xs, ys)
    ys_ext = M2._neg_y_ext(spec, ys)
    idx_enc = M2._materialize_stream(plan, rg, order_y, b_start, b_end)
    pxy, v = M2._gather_rows_pk(plan, xy, idx_enc)
    px, py, v_old = M2._gather_group_masked(
        BN254_G1, plan, rg, xs, ys_ext, order_y, b_start, b_end,
        None, jnp.int32(0))

    lanes = plan.lanes
    mod = tuple(int(x) for x in spec.mod_limbs)
    kernel = ft.partial(M2._accum_scan_kernel_xy, mod=mod,
                        n0=int(spec.n0inv),
                        one_m=tuple(int(x) for x in spec.one_mont_limbs))
    from jax.experimental.pallas import tpu as pltpu

    coord_in = pl.BlockSpec((1, k, lanes), lambda j, i: (i, 0, j),
                            memory_space=pltpu.VMEM)
    flag_in = pl.BlockSpec((8, lanes), lambda j, i: (i // 8, j),
                           memory_space=pltpu.VMEM)
    coord_acc = pl.BlockSpec((k, lanes), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM)
    exc_spec = pl.BlockSpec((8, lanes), lambda j, i: (0, j),
                            memory_space=pltpu.VMEM)
    z = jnp.zeros((k, lanes), jnp.uint32)
    ze = jnp.zeros((8, lanes), jnp.uint32)
    ox, oy, oz, oe = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((k, lanes), jnp.uint32)] * 3
        + [jax.ShapeDtypeStruct((8, lanes), jnp.uint32)],
        grid=(1, rg),
        in_specs=[coord_acc, coord_acc, coord_acc, exc_spec, coord_in, flag_in],
        out_specs=[coord_acc] * 3 + [exc_spec],
        interpret=True,
    )(z, z, z, ze, pxy, v)

    jx, jy, jz, _ = M2._accumulate_jnp(spec, px, py, v_old)
    assert int(jnp.sum(oe)) == 0  # no in-bucket doubles with distinct points
    got = BN254_G1.decode_jac((ox.T, oy.T, oz.T))
    want = BN254_G1.decode_jac((jx.T, jy.T, jz.T))
    assert got == want


@pytest.mark.skipif(
    os.environ.get("ZKPOA_INTERPRET_TESTS") != "1",
    reason="Pallas interpret mode executes these unrolled field kernels "
           ">30min even at toy geometry; kernel exactness is enforced on "
           "hardware end-to-end (bench.py + experiments/msm_ab.py check "
           "the full MSM against host scalar arithmetic on every run)")
def test_weighted_reduce_pallas_interpret_matches_xla():
    """The Pallas weighted-reduce kernel (fold + double suffix scan with
    VMEM-resident per-window state) must agree with the XLA reduce on the
    same bucket state — including infinity lanes and equal-point lanes
    (the full unified in-kernel Jacobian add)."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(7)
    spec = BN254_G1.field
    k = spec.n_limbs
    plan = M2.MsmPlan(4, 3, 64, 16)  # nw=2, nb=4, spread=2 (fold on)
    lanes = plan.lanes
    pts = [bn254.g1_mul(bn254.G1_GEN, int(g)) for g in
           rng.integers(1, 2**28, size=lanes, dtype=np.int64)]
    # equal neighbours at the first suffix shift: exercises is_double
    pts[0] = pts[0 + 1]
    xs = np.asarray(spec.encode([p[0] for p in pts]))
    ys = np.asarray(spec.encode([p[1] for p in pts]))
    one_m = np.asarray(spec.one_mont_limbs, dtype=np.uint32)
    zs = np.broadcast_to(one_m, (lanes, k)).copy()
    zs[3] = 0  # infinity lanes
    zs[6] = 0
    ox = jnp.asarray(xs.T.copy())
    oy = jnp.asarray(ys.T.copy())
    oz = jnp.asarray(zs.T.copy())

    want = M2._weighted_reduce(
        BN254_G1,
        (ox.T.reshape(plan.nw, plan.nb, k),
         oy.T.reshape(plan.nw, plan.nb, k),
         oz.T.reshape(plan.nw, plan.nb, k)),
        plan,
    )
    with pltpu.force_tpu_interpret_mode():
        got = M2._weighted_reduce_pallas(BN254_G1, plan, ox, oy, oz)
    d_want = BN254_G1.decode_jac(jax.tree.map(lambda a: a[None], want))[0]
    d_got = BN254_G1.decode_jac(jax.tree.map(lambda a: a[None], got))[0]
    assert d_got == d_want


def test_repair_exc_lanes_reconstructs_full_msm():
    """The in-bucket-doubling lane repair (host recompute of flagged
    bucket lanes) must reproduce the exact member/sign/top-window-digit/
    weight accounting of the device plan: flagging EVERY lane makes the
    summed repair contribution equal the full MSM value."""
    import types

    from zkpoa_tpu.fields import bn254

    rng = np.random.default_rng(77)
    n, c = 16, 6
    spec = BN254_G1.field
    gen_mults = [int(g) + 1 for g in rng.integers(1, 1 << 30, size=n)]
    pts = [bn254.g1_mul(bn254.G1_GEN, g) for g in gen_mults]
    xs = spec.encode([p[0] for p in pts])
    ys = spec.encode([p[1] for p in pts])
    scalars = [int.from_bytes(rng.bytes(32), "big") % bn254.R
               for _ in range(n)]
    sc = M2.scalars_to_limbs_fast(scalars)
    wplan = M2.plan_witness_msms(sc, jnp.asarray(sc), c=c)
    assert not wplan.heavy  # random scalars: nothing peeled
    query = types.SimpleNamespace(xs=xs, ys=ys,
                                  valid=np.ones(n, dtype=bool))
    ae = np.zeros((8, wplan.geo.lanes), dtype=np.uint32)
    ae[0, :] = 1  # flag every lane
    flagged, extra = M2._repair_exc_lanes(
        BN254_G1, wplan, query, np.ones(n, dtype=bool), ae,
        bn254.g1_add, bn254.g1_mul, 0)
    assert len(flagged) == wplan.geo.lanes
    want_k = sum(s * g for s, g in zip(scalars, gen_mults)) % bn254.R
    want = bn254.g1_mul(bn254.G1_GEN, want_k)
    assert extra == want
