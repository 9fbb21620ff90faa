"""Fused Pippenger MSM for TPU: VMEM-resident buckets, one kernel per MSM.

This replaces the round-at-a-time msm.py device path (which round-trips the
full bucket state through HBM every round and pays a pow2-rounded global
round bound) with a single `pallas_call` whose grid runs over accumulation
rounds while the whole bucket array stays resident in VMEM:

  * signed digits: window digits are recoded to d in [-2^(c-1), 2^(c-1)]
    so 2^(c-1) buckets per window suffice (negative digits use -P, i.e. a
    gather from a pre-negated y array). Bucket j holds digit j+1.
  * top-window spreading: the top window only spans the left-over high
    bits of the scalar (254 mod c), so its per-bucket occupancy — and with
    it the global round count — would be ~2^(c-1-top_bits) times worse
    than the body windows (measured 2048 vs ~40 rounds at N=2^17, c=13 in
    the old kernel). The top window's points are spread round-robin over
    `spread = nb / 2^rem` bucket aliases at stride 2^rem (the number of
    NONZERO top digit values — a power of two, so every bucket is used
    and the halving fold stays power-of-two), folded back before the
    weighted reduction. This keeps ALL windows' occupancy ~N/2^(c-1)
    (round-2's stride of 2^rem+1 quantized the spread down 2× and left
    a dead zero-digit slot — the top window ran ~2× more rounds than the
    body and set the global bound).
  * conflict-free rounds: per window, points are argsorted by bucket slot;
    round r adds the r-th point of every (window, bucket) run at once. The
    per-round point stream is pre-gathered by XLA into [R, K, L] (limb-
    major, L = nw * nb lanes); the kernel reads one [K, L] block per grid
    step and accumulates into VMEM-resident Jacobian bucket outputs.
  * weighted bucket reduction sum_j (j+1) B_j via halving folds:
    T(B[0..m)) = T(B_lo + B_hi) + h * S(B_hi). The h*S terms telescope into
    one double+add per level (E <- 2E + S_hi gives sum_t 2^(T-t) S_t =
    sum_t h_t S_t exactly when h_t = nb/2^t). ~2*nb lane-adds per window
    vs the old double-suffix-scan's 2*c*nb.

Replaces rapidsnark's CPU MSM (reference scripts/g16_prove.sh:246-252,
SURVEY.md §2.5); the whole pipeline is exact uint32 limb arithmetic.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbs as L
from . import pallas_field as PF
from .limbs import LIMB_BITS, FieldSpec

# BN254 group order (public constant): bounds the top window digit of any
# reduced scalar — see MsmPlan.top_stride
_BN254_R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

ROUND_GRANULE = 16  # static round counts rounded up to this (compile reuse)
HOST_PLAN_MIN_N = 1 << 18  # above this, plan streams on the host (numpy):
# the device-sort XLA program takes ~10 min to remote-compile at N ~ 10^6
LANE_TILE = 4096  # lane-axis tile of the accumulation kernel (VMEM budget)


# ---------------------------------------------------------------------------
# Planning (host): window geometry + static round bound
# ---------------------------------------------------------------------------


class MsmPlan:
    """Static geometry of one MSM kernel invocation (hashable: used as a
    jit static argument)."""

    def __init__(self, n_bits: int, c: int, n: int, rounds: int, use_jnp: bool = False):
        assert 2 <= c <= LIMB_BITS and c * ((n_bits + c - 1) // c) > n_bits, (
            "c must not divide n_bits (the top window absorbs the recoding "
            "carry only when its digit range stays below 2^(c-1))"
        )
        self.n_bits = n_bits
        self.c = c
        self.n = n
        self.use_jnp = use_jnp  # force the unified jnp accumulator
        self.nb = 1 << (c - 1)  # buckets per window (signed digits)
        # No extra carry window: the top window spans rem = n_bits - c*(nw-1)
        # < c bits, so its digit e <= 2^rem (incl. carry-in) <= 2^(c-1) never
        # triggers the negative recoding and never carries out.
        self.nw = (n_bits + c - 1) // c
        rem = n_bits - c * (self.nw - 1)
        self.range_top = (1 << rem) + 1  # top |digit| in [0, 2^rem]
        # Top-window load balancing. For BN254 scalars only
        # top_count = (r >> (c*(nw-1))) + 1 digit values can occur (e.g.
        # 97 of 2^rem=128 at c=13) — under the power-of-two alias tiling
        # the populated slots then carry ~2^rem/top_count more load than
        # the body windows and SET the global round bound (measured 439
        # vs body ~330 at N=2^20/c=13). When top_count < 2^rem, digit d
        # instead gets the contiguous alias BLOCK
        # [(d-1)*top_block, d*top_block), top_block = nb // top_count:
        # every digit's per-slot load drops to ~N/(top_count*top_block)
        # ~= the body mean. The reduce folds each block to its head with
        # masked ascending-shift roll-adds, then compacts heads to slots
        # [0, top_count) so the weighted suffix scan sees weight slot+1
        # as usual. With top_count == 2^rem (non-254-bit plans, c=11/12)
        # the classic power-of-two stride tiling is used unchanged.
        top_count = 1 << rem
        if n_bits == 254:
            top_count = min(top_count, (_BN254_R >> (c * (self.nw - 1))) + 1)
        if top_count < (1 << rem) and (self.nb // top_count) >= 2:
            self.top_count = int(top_count)
            self.top_block = self.nb // self.top_count
            self.top_stride = 0  # unused on the block path
            self.spread = 1
        else:
            self.top_count = 1 << rem
            self.top_block = 0
            self.top_stride = 1 << rem
            self.spread = max(self.nb // self.top_stride, 1)
        self.rounds = rounds
        self.lanes = self.nw * self.nb

    def key(self):
        return (self.n_bits, self.c, self.n, self.rounds, self.use_jnp)

    def __hash__(self):
        return hash(self.key())

    def __eq__(self, other):
        return isinstance(other, MsmPlan) and self.key() == other.key()


def _digits_signed_np(scalars_limbs: np.ndarray, plan: MsmPlan):
    """Numpy mirror of the on-device recoding — used for the static round
    bound (scalars are host-known in the prover) and in tests."""
    n = scalars_limbs.shape[0]
    c, nw, nb = plan.c, plan.nw, plan.nb
    half = 1 << (c - 1)
    carry = np.zeros(n, dtype=np.int64)
    slots = np.zeros((nw, n), dtype=np.int64)
    signs = np.zeros((nw, n), dtype=bool)
    for w in range(nw):
        off = c * w
        limb, sh = divmod(off, LIMB_BITS)
        if limb < scalars_limbs.shape[1]:
            word = scalars_limbs[:, limb].astype(np.int64) >> sh
            if sh > 0 and limb + 1 < scalars_limbs.shape[1]:
                word |= scalars_limbs[:, limb + 1].astype(np.int64) << (LIMB_BITS - sh)
        else:
            word = np.zeros(n, dtype=np.int64)
        e = (word & ((1 << c) - 1)) + carry
        neg = e > half
        d = np.where(neg, (1 << c) - e, e)  # |digit|
        signs[w] = neg & (d > 0)
        slots[w] = d  # 0 = skip; else bucket slot d-1
        carry = neg.astype(np.int64)
    # top-window alias layout (see MsmPlan): balanced blocks or pow2 stride
    w = nw - 1
    if plan.top_block:
        chunk = np.arange(n, dtype=np.int64) % plan.top_block
        slots[w] = np.where(
            slots[w] > 0, (slots[w] - 1) * plan.top_block + chunk + 1, 0)
    elif plan.spread > 1:
        chunk = np.arange(n, dtype=np.int64) % plan.spread
        slots[w] = np.where(slots[w] > 0, slots[w] + plan.top_stride * chunk, 0)
    return slots, signs


def plan_msm(
    scalars_limbs: np.ndarray,
    n_bits: int,
    c: int,
    point_valid: Optional[np.ndarray] = None,
) -> MsmPlan:
    """Host planning: compute the exact max bucket occupancy (over all
    windows, after signed recoding + top spread) and round it to a
    ROUND_GRANULE multiple for compile-cache reuse."""
    n = scalars_limbs.shape[0]
    plan = MsmPlan(n_bits, c, n, rounds=0)
    slots, _ = _digits_signed_np(scalars_limbs, plan)
    if point_valid is not None:
        slots = np.where(np.asarray(point_valid)[None, :], slots, 0)
    occ = 1
    for w in range(plan.nw):
        s = slots[w]
        s = s[s > 0]
        if s.size:
            occ = max(occ, int(np.bincount(s - 1, minlength=plan.nb).max()))
    rounds = ((occ + ROUND_GRANULE - 1) // ROUND_GRANULE) * ROUND_GRANULE
    return MsmPlan(n_bits, c, n, rounds)


# ---------------------------------------------------------------------------
# Device digit recoding + sort + stream index computation
# ---------------------------------------------------------------------------


def _digits_signed_jnp(scalars: jnp.ndarray, plan: MsmPlan):
    """scalars [N, K_s] plain 16-bit limbs -> (slots [nw, N] int32 with 0 =
    skip / slot+1 otherwise, signs [nw, N] bool). Top window spread applied."""
    n = scalars.shape[0]
    c, nw = plan.c, plan.nw
    half = jnp.int32(1 << (c - 1))
    full = jnp.int32(1 << c)
    words = []
    for w in range(nw):
        off = c * w
        limb, sh = divmod(off, LIMB_BITS)
        if limb < scalars.shape[1]:
            word = (scalars[:, limb] >> sh).astype(jnp.int32)
            if sh > 0 and limb + 1 < scalars.shape[1]:
                word = word | (scalars[:, limb + 1].astype(jnp.int32) << (LIMB_BITS - sh))
        else:
            word = jnp.zeros((n,), jnp.int32)
        words.append(word & jnp.int32((1 << c) - 1))
    words = jnp.stack(words, axis=0)  # [nw, N]

    def step(carry, e):
        e = e + carry
        neg = e > half
        d = jnp.where(neg, full - e, e)
        return neg.astype(jnp.int32), (d, neg & (d > 0))

    _, (slots, signs) = jax.lax.scan(step, jnp.zeros((n,), jnp.int32), words)
    top = slots[nw - 1]
    if plan.top_block:
        chunk = jnp.arange(n, dtype=jnp.int32) % plan.top_block
        slots = slots.at[nw - 1].set(
            jnp.where(top > 0, (top - 1) * plan.top_block + chunk + 1, 0))
    elif plan.spread > 1:
        chunk = (jnp.arange(n, dtype=jnp.int32) % plan.spread) * plan.top_stride
        slots = slots.at[nw - 1].set(jnp.where(top > 0, top + chunk, 0))
    return slots, signs


def _sort_and_starts(slots, signs, point_valid, plan: MsmPlan):
    """Per-window sort by bucket slot. Returns (order_y [nw, N] int32
    gather indices into the [2N]-extended y table encoding the sign,
    order_x [nw, N], b_start/b_end [nw, nb]).

    One variadic lax.sort carries the sign-encoded index as the VALUE, so
    the sorted keys and sorted sign-indices come out of the sort directly
    — the old argsort + two [nw, N] take_along_axis gathers paid the
    ~13ns/element gather tax twice on top of the sort. Stability is not
    required: any within-bucket visit order accumulates the same sum."""
    n = plan.n
    nb = plan.nb
    key = jnp.where(slots > 0, slots - 1, nb)  # invalid/skip -> sentinel nb
    if point_valid is not None:
        key = jnp.where(point_valid[None, :], key, nb)
    idx_y = (jnp.arange(n, dtype=jnp.int32)[None, :]
             + jnp.where(signs, jnp.int32(n), jnp.int32(0)))
    key_sorted, order_y = jax.lax.sort(
        (key.astype(jnp.int32), jnp.broadcast_to(idx_y, key.shape)),
        dimension=1, num_keys=1, is_stable=False)
    bucket_ids = jnp.arange(nb + 1, dtype=key_sorted.dtype)
    starts = jax.vmap(lambda row: jnp.searchsorted(row, bucket_ids, side="left"))(
        key_sorted
    )  # [nw, nb + 1]
    order_x = jnp.where(order_y >= n, order_y - n, order_y)
    return order_y, order_x, starts[:, :-1], starts[:, 1:]


# ---------------------------------------------------------------------------
# The accumulation kernel
# ---------------------------------------------------------------------------


def _k_jac_madd_noexcept(x1, y1, z1, xq, yq, q_valid, mod, n0, one_m):
    """Mixed add WITHOUT the parallel-double fallback: ~11 field muls
    instead of ~17. The P == Q case (same x, same y) is NOT computed —
    it is returned as an exception flag; the caller re-runs through the
    unified jnp path if any lane ever flags (never, for distinct input
    points, since a bucket only ever accumulates distinct points)."""
    mm = lambda p, q: PF.k_mont_mul(p, q, mod, n0)
    z1z1 = mm(z1, z1)
    u2 = mm(xq, z1z1)
    s2 = mm(mm(yq, z1), z1z1)
    h = PF.k_sub_mod(u2, x1, mod)
    r = PF.k_sub_mod(s2, y1, mod)
    hh = mm(h, h)
    hhh = mm(h, hh)
    v = mm(x1, hh)
    x3 = PF.k_sub_mod(PF.k_sub_mod(mm(r, r), hhh, mod), PF.k_dbl_mod(v, mod), mod)
    y3 = PF.k_sub_mod(mm(r, PF.k_sub_mod(v, x3, mod)), mm(y1, hhh), mod)
    z3 = mm(z1, h)

    p_inf = PF.k_is_zero(z1)
    same_x = PF.k_is_zero(h)
    same_y = PF.k_is_zero(r)
    is_double = jnp.logical_and(jnp.logical_and(same_x, same_y),
                                jnp.logical_not(p_inf))
    is_cancel = jnp.logical_and(same_x, jnp.logical_not(same_y))

    zero = [jnp.zeros_like(z3[0])] * len(z3)
    one = [jnp.full_like(z3[0], one_m[j]) for j in range(len(z3))]
    z3 = PF.k_select(is_cancel, zero, z3)
    x3 = PF.k_select(p_inf, xq, x3)
    y3 = PF.k_select(p_inf, yq, y3)
    z3 = PF.k_select(p_inf, one, z3)
    invalid = jnp.logical_not(q_valid)
    x3 = PF.k_select(invalid, x1, x3)
    y3 = PF.k_select(invalid, y1, y3)
    z3 = PF.k_select(invalid, z1, z3)
    exc = jnp.logical_and(is_double, q_valid)
    return x3, y3, z3, exc


def _accum_kernel_body(px_ref, py_ref, v_ref, ox_ref, oy_ref, oz_ref, oe_ref,
                       *, mod, n0, one_m):
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _init():
        zero = jnp.zeros(ox_ref.shape, ox_ref.dtype)
        ox_ref[...] = zero
        oy_ref[...] = zero
        oz_ref[...] = zero
        oe_ref[...] = jnp.zeros(oe_ref.shape, oe_ref.dtype)

    k = ox_ref.shape[0]
    x1 = [ox_ref[j] for j in range(k)]
    y1 = [oy_ref[j] for j in range(k)]
    z1 = [oz_ref[j] for j in range(k)]
    xq = [px_ref[0, j] for j in range(k)]
    yq = [py_ref[0, j] for j in range(k)]
    # the valid block carries 8 rounds (TPU min sublane tile); pick ours
    vq = v_ref[r % 8] != 0
    x3, y3, z3, exc = _k_jac_madd_noexcept(x1, y1, z1, xq, yq, vq, mod, n0, one_m)
    ox_ref[...] = PF._stack(x3)
    oy_ref[...] = PF._stack(y3)
    oz_ref[...] = PF._stack(z3)
    oe_ref[0] = oe_ref[0] | exc.astype(jnp.uint32)


def _accumulate_jnp(spec: FieldSpec, px_stream, py_stream, valid_stream):
    """Reference accumulation with the same statement as the Pallas kernel
    but UNIFIED adds (P == Q handled): a lax.scan of branchless mixed adds
    over the round stream. Used on the CPU backend (tests, virtual meshes),
    as the fallback when the fast kernel flags an in-bucket doubling, and
    as the cross-check for the fused kernel on hardware."""
    from .curve_jax import fp_arith, jac_add_affine

    ar = fp_arith(spec)
    k = spec.n_limbs
    lanes = px_stream.shape[2]
    zero = jnp.zeros((lanes, k), dtype=jnp.uint32)
    acc0 = (zero, zero, zero)

    def step(acc, xs):
        pxr, pyr, vr = xs  # [K, L], [K, L], [L]
        out = jac_add_affine(ar, acc, pxr.T, pyr.T, vr != 0)
        return out, None

    acc, _ = jax.lax.scan(step, acc0, (px_stream, py_stream, valid_stream))
    return acc[0].T, acc[1].T, acc[2].T, jnp.zeros((lanes,), jnp.uint32)


def _accumulate(spec: FieldSpec, px_stream, py_stream, valid_stream, plan: MsmPlan):
    """px/py_stream [R, K, L] uint32 Montgomery coords, valid [R, L] uint32.
    Returns bucket Jacobian acc as three [K, L] arrays plus a [L] exception
    row: nonzero lanes hit an in-bucket P == Q doubling the fast kernel
    does not compute (re-run via the unified jnp path)."""
    import os

    if (
        jax.default_backend() == "cpu"
        or os.environ.get("ZKPOA_PALLAS") == "0"
        or plan.use_jnp
    ):
        return _accumulate_jnp(spec, px_stream, py_stream, valid_stream)
    k = spec.n_limbs
    lanes = px_stream.shape[2]
    r = px_stream.shape[0]
    mod = tuple(int(x) for x in spec.mod_limbs)
    n0 = int(spec.n0inv)
    one_m = tuple(int(x) for x in spec.one_mont_limbs)

    # Tile the lane axis so the kernel's live temporaries (the fully
    # unrolled mixed-add works on ~300 [TILE]-wide rows) fit the ~16MB
    # scoped-VMEM budget; the acc tile stays VMEM-resident across the inner
    # rounds axis of the grid (constant index_map in r) and is written back
    # once per lane tile.
    tile = LANE_TILE if lanes % LANE_TILE == 0 else lanes
    ntiles = lanes // tile
    kernel = functools.partial(_accum_kernel_body, mod=mod, n0=n0, one_m=one_m)
    coord_in = pl.BlockSpec(
        (1, k, tile), lambda j, i: (i, 0, j), memory_space=pltpu.VMEM
    )
    # TPU blocks need sublane dim >= 8: fetch 8 rounds of masks per block
    flag_in = pl.BlockSpec((8, tile), lambda j, i: (i // 8, j), memory_space=pltpu.VMEM)
    coord_out = pl.BlockSpec((k, tile), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    exc_out = pl.BlockSpec((8, tile), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    ox, oy, oz, oe = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((k, lanes), jnp.uint32)] * 3
        + [jax.ShapeDtypeStruct((8, lanes), jnp.uint32)],
        grid=(ntiles, r),
        in_specs=[coord_in, coord_in, flag_in],
        out_specs=[coord_out] * 3 + [exc_out],
    )(px_stream, py_stream, valid_stream)
    return ox, oy, oz, oe[0]


# ---------------------------------------------------------------------------
# Bucket reduction (XLA-level, batch-major point pytrees via curve ops).
# Every step operates on the FIXED [nw, nb] lane shape (masked rolls inside
# fori_loops) so the whole reduction compiles exactly one add / one double
# kernel variant — shape-shrinking folds would trigger O(log^2 nb) separate
# Mosaic compiles of the large unrolled point kernels.
# ---------------------------------------------------------------------------


def _tmap(fn, *trees):
    return jax.tree.map(fn, *trees)


def _masked_roll_add(curve, p, shift, keep_mask):
    """p[j] += p[j + shift] where keep_mask[j] (else p[j] unchanged), along
    the bucket axis of [nw, nb] lanes. shift is a traced int32 scalar."""
    rolled = _tmap(lambda a: jnp.roll(a, -shift, axis=1), p)
    leaf = jax.tree.leaves(p)[0]
    inf = curve.infinity((leaf.shape[0], leaf.shape[1]))
    shifted = _tmap(
        lambda a, b: jnp.where(keep_mask[..., None], a, b), rolled, inf
    )
    return curve.add(p, shifted)


def _weighted_reduce(curve, buckets, plan: MsmPlan):
    """buckets: Jacobian pytree with leaves [nw, nb, K]; bucket j of window
    w holds the sum of points with |digit| == j+1 (top window: slot layout
    (|d|-1) + top_stride*chunk, chunk < spread). Returns the combined MSM
    result (leaves [K]) including the 2^(c*w) window weighting (Horner)."""
    nw, nb, c = plan.nw, plan.nb, plan.c
    bpos = jnp.arange(nb, dtype=jnp.int32)[None, :]

    if plan.top_block:
        # balanced-block top window: fold each digit's alias block to its
        # head with ascending masked roll-adds ((pos mod B) + sh < B keeps
        # the fold inside the block), then compact heads (d-1)*B to slots
        # [0, top_count) so the weighted suffix scan sees weight slot+1
        b_blk = plan.top_block
        top = _tmap(lambda a: a[nw - 1 : nw], buckets)
        posmod = bpos % jnp.int32(b_blk)
        sh = 1
        while sh < b_blk:
            keep = posmod + sh < b_blk
            top = _masked_roll_add(curve, top, jnp.int32(sh), keep)
            sh <<= 1
        heads = jnp.arange(nb, dtype=jnp.int32) * b_blk  # clamped gather
        heads = jnp.minimum(heads, nb - 1)
        in_range = jnp.arange(nb, dtype=jnp.int32) < plan.top_count
        top = _tmap(
            lambda a: jnp.where(in_range[None, :, None] if a.ndim == 3
                                else in_range[None, :],
                                a[:, heads], jnp.zeros_like(a)), top)
        buckets = _tmap(
            lambda a, t: jnp.concatenate([a[: nw - 1], t], axis=0), buckets, top
        )

    # fold the top window's spread aliases back onto slots [0, top_stride):
    # log2(spread) masked-roll halvings on the fixed [1, nb] shape.
    if plan.spread > 1:
        top = _tmap(lambda a: a[nw - 1 : nw], buckets)
        shifts = []
        s = plan.spread
        while s > 1:
            s //= 2
            shifts.append(s * plan.top_stride)
        shifts_arr = jnp.asarray(shifts, dtype=jnp.int32)

        def fold_body(t, p):
            sh = shifts_arr[t]
            keep = bpos[:, : plan.nb] < sh  # only slots below the shift fold
            return _masked_roll_add(curve, p, sh, keep)

        top = jax.lax.fori_loop(0, len(shifts), fold_body, top)
        # slots >= top_stride still hold the stale pre-fold partial sums —
        # clear them to infinity (z = 0) or the weighted scan would count them
        keep_final = (bpos < plan.top_stride)[..., None]
        top = _tmap(lambda a: jnp.where(keep_final, a, jnp.zeros_like(a)), top)
        buckets = _tmap(
            lambda a, t: jnp.concatenate([a[: nw - 1], t], axis=0), buckets, top
        )

    # weighted sum per window: T_w = sum_j (j+1) B_j = sum_j suffix_j where
    # suffix_j = sum_{j'>=j} B_j'. Two Hillis-Steele suffix scans on the
    # fixed [nw, nb] shape (one add-kernel variant, 2*(c-1) steps).
    def suffix_scan(p):
        def step(st, p):
            sh = jnp.int32(1) << st
            keep = bpos + sh < nb
            rows = jax.tree.leaves(p)[0].shape[0]
            return _masked_roll_add(curve, p, sh, jnp.broadcast_to(keep, (rows, nb)))

        return jax.lax.fori_loop(0, c - 1, step, p)

    suffix = suffix_scan(buckets)
    dsuffix = suffix_scan(suffix)
    totals = _tmap(lambda a: a[:, 0], dsuffix)  # [nw, K]
    return _horner_windows(curve, totals, plan)


def _horner_windows(curve, totals, plan: MsmPlan):
    """Combine per-window totals (leaves [nw, K]) with the 2^(c*w) window
    weights: Horner over windows, high first: res = ((T_hi * 2^c) + T_next)."""
    nw, c = plan.nw, plan.c
    res = _tmap(lambda a: a[nw - 1 : nw], totals)  # [1, K]

    def horner_body(i, res):
        w = nw - 2 - i
        res = jax.lax.fori_loop(0, c, lambda _, p: curve.double(p), res)
        wt = _tmap(lambda a: jax.lax.dynamic_slice_in_dim(a, w, 1, axis=0), totals)
        return curve.add(res, wt)

    if nw > 1:
        res = jax.lax.fori_loop(0, nw - 1, horner_body, res)
    return _tmap(lambda a: a[0], res)


# ---------------------------------------------------------------------------
# Pallas weighted reduction. The XLA-level reduce above runs its 2(c-1)
# masked-roll full-Jacobian adds as separate [nw, nb]-wide XLA limb
# programs — measured 259ms at c=13/N=2^20 (MSM_STAGES.json), the same
# order as the whole bucket accumulation. This kernel keeps each window's
# bucket state VMEM-resident across all scan steps: grid = (nw, S) with a
# per-step (shift, keep-limit) table in SMEM driving the same fold /
# double-suffix-scan schedule, full unified Jacobian adds in-kernel.
# ---------------------------------------------------------------------------


def _reduce_step_table(plan: MsmPlan) -> np.ndarray:
    """Per-step [S, 6] int32 rows: (body shift, body keep-limit, body mode,
    top shift, top keep-limit, top mode). Modes: 0 = masked roll-add with
    keep = pos < limit; 1 = clear z where NOT (pos < limit); 2 = block
    fold (keep = (pos mod top_block) + shift < top_block); 4 = clear z
    where NOT ((pos mod top_block) == 0 AND pos < limit); 5 = no-op.

    Body windows run the classic double suffix scan (weights slot+1). A
    balanced-block top window (plan.top_block) instead: block-folds each
    digit's aliases to its head at (d-1)*top_block, clears non-heads,
    then runs the double suffix scan AT STRIDE top_block — the second
    scan leaves sum_d d*S_d at position 0, exactly the top window's
    total, with no in-kernel compaction (only rolls/selects/adds)."""
    nb, c = plan.nb, plan.c
    body = []
    for _ in range(2):
        for st in range(c - 1):
            sh = 1 << st
            body.append((sh, nb - sh, 0))
    top = []
    if plan.top_block:
        b_blk, tc = plan.top_block, plan.top_count
        sh = 1
        while sh < b_blk:
            top.append((sh, 0, 2))
            sh <<= 1
        top.append((0, tc * b_blk, 4))  # clear non-heads
        span = tc * b_blk
        steps = max((tc - 1).bit_length(), 1)
        for _ in range(2):
            for st in range(steps):
                sh = (1 << st) * b_blk
                top.append((sh, span - sh if span > sh else 0, 0))
    elif plan.spread > 1:
        s = plan.spread
        while s > 1:
            s //= 2
            top.append((s * plan.top_stride, s * plan.top_stride, 0))
        top.append((0, plan.top_stride, 1))
        top.extend(body)
    else:
        top = list(body)
    n_steps = max(len(body), len(top))
    body += [(0, 0, 5)] * (n_steps - len(body))
    top += [(0, 0, 5)] * (n_steps - len(top))
    rows = [bo + to for bo, to in zip(body, top)]
    return np.asarray(rows, dtype=np.int32)


def _reduce_scan_kernel(tbl_ref, ax_ref, ay_ref, az_ref,
                        ox_ref, oy_ref, oz_ref, xs_s, ys_s, zs_s,
                        *, mod, n0, nw, top_block):
    w = pl.program_id(0)
    s = pl.program_id(1)
    n_steps = pl.num_programs(1)
    nb = ax_ref.shape[1]
    k = ax_ref.shape[0]

    @pl.when(s == 0)
    def _seed():
        xs_s[...] = ax_ref[...]
        ys_s[...] = ay_ref[...]
        zs_s[...] = az_ref[...]

    is_top = w == nw - 1
    shift = jnp.where(is_top, tbl_ref[s, 3], tbl_ref[s, 0])
    lim = jnp.where(is_top, tbl_ref[s, 4], tbl_ref[s, 1])
    mode = jnp.where(is_top, tbl_ref[s, 5], tbl_ref[s, 2])
    pos = jax.lax.broadcasted_iota(jnp.int32, (k, nb), 1)
    keep = pos < lim
    if top_block:
        posmod = pos % jnp.int32(top_block)
        blk_keep = posmod + shift < top_block
        is_blk = mode == 2  # Mosaic cannot select between i1 vectors
        keep = jnp.logical_or(jnp.logical_and(is_blk, blk_keep),
                              jnp.logical_and(jnp.logical_not(is_blk), keep))
        head_keep = jnp.logical_and(posmod == 0, pos < lim)

        @pl.when(mode == 4)
        def _clear_non_heads():
            zs_s[...] = jnp.where(head_keep, zs_s[...], jnp.uint32(0))

    @pl.when(mode == 1)
    def _clear():
        zs_s[...] = jnp.where(keep, zs_s[...], jnp.uint32(0))

    @pl.when(jnp.logical_and(mode != 1, jnp.logical_and(mode != 4, mode != 5)))
    def _fold_add():
        amt = (nb - shift) % nb  # pltpu.roll shifts right; we roll left
        rx = pltpu.roll(xs_s[...], amt, 1)
        ry = pltpu.roll(ys_s[...], amt, 1)
        rz = jnp.where(keep, pltpu.roll(zs_s[...], amt, 1), jnp.uint32(0))
        # unified add in column chunks: the fully unrolled _k_jac_add's
        # live temporaries on [K, 4096] rows blow the ~16MB scoped-VMEM
        # budget (measured OOM at c=13); the post-roll add is lane-wise,
        # so chunking the columns only bounds the temporary footprint.
        # At nb >= 16384 (c=15) even 1024-column chunks overflowed the
        # scoped budget by 2.8MB (MSM_AB r5 record) — halve again.
        chunk = min(nb, 1024 if nb <= 8192 else 512)
        for c0 in range(0, nb, chunk):
            sl = slice(c0, c0 + chunk)
            x3, y3, z3 = PF._k_jac_add(
                PF._rows(xs_s[:, sl]), PF._rows(ys_s[:, sl]),
                PF._rows(zs_s[:, sl]),
                PF._rows(rx[:, sl]), PF._rows(ry[:, sl]),
                PF._rows(rz[:, sl]), mod, n0)
            xs_s[:, sl] = PF._stack(x3)
            ys_s[:, sl] = PF._stack(y3)
            zs_s[:, sl] = PF._stack(z3)

    ow = ox_ref.shape[2]  # 128 on hardware; = nb in tiny interpret tests

    @pl.when(s == n_steps - 1)
    def _emit():
        ox_ref[0] = xs_s[:, :ow]
        oy_ref[0] = ys_s[:, :ow]
        oz_ref[0] = zs_s[:, :ow]


@functools.partial(jax.jit, static_argnums=(0, 1))
def _weighted_reduce_pallas(curve, plan: MsmPlan, ox, oy, oz):
    """Weighted bucket reduction with the scan steps in one Pallas program
    (VMEM-resident per-window state); Horner over windows stays in XLA
    (nw-1 tiny point ops). ox/oy/oz: [K, nw*nb] bucket Jacobians."""
    spec = curve.field
    k = spec.n_limbs
    nw, nb = plan.nw, plan.nb
    mod = tuple(int(x) for x in spec.mod_limbs)
    tbl = jnp.asarray(_reduce_step_table(plan))
    n_steps = int(tbl.shape[0])
    kernel = functools.partial(_reduce_scan_kernel, mod=mod,
                               n0=int(spec.n0inv), nw=nw,
                               top_block=plan.top_block)
    ow = min(nb, 128)
    win_in = pl.BlockSpec((k, nb), lambda w, s: (0, w), memory_space=pltpu.VMEM)
    tot_out = pl.BlockSpec((1, k, ow), lambda w, s: (w, 0, 0),
                           memory_space=pltpu.VMEM)
    tx, ty, tz = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((nw, k, ow), jnp.uint32)] * 3,
        grid=(nw, n_steps),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), win_in, win_in, win_in],
        out_specs=[tot_out] * 3,
        scratch_shapes=[pltpu.VMEM((k, nb), jnp.uint32)] * 3,
    )(tbl, ox, oy, oz)
    totals = (tx[:, :, 0], ty[:, :, 0], tz[:, :, 0])  # [nw, K] leaves
    return _horner_windows(curve, totals, plan)


# ---------------------------------------------------------------------------
# Top-level fused MSM
# ---------------------------------------------------------------------------


def plan_and_stream(
    scalars_limbs: np.ndarray,
    n_bits: int,
    c: int,
    point_valid_np,
    plan: Optional[MsmPlan] = None,
):
    """One-call host planning: (MsmPlan, (order_y, b_start, b_end)).
    Uses the native C++ planner (native/msm_plan.cc: recode + counting
    sort, OpenMP) when a compiler exists — the numpy path costs ~12s per
    MSM at N=2^20, which dominated the measured on-hardware MSM time."""
    from ..native import plan as nplan

    sc = np.asarray(scalars_limbs)
    nb_ = n_bits if plan is None else plan.n_bits
    c_ = c if plan is None else plan.c
    # geometry probe: the native planner must lay buckets out with the
    # same top-window alias scheme the kernels/reduce expect
    probe = MsmPlan(nb_, c_, sc.shape[0], ROUND_GRANULE)
    if nplan.available(nb_, c_):
        occ, oy, bs, be = nplan.plan_stream(sc, nb_, c_, point_valid_np,
                                            top_stride=probe.top_stride,
                                            top_block=probe.top_block)
        if plan is None:
            rounds = ((occ + ROUND_GRANULE - 1) // ROUND_GRANULE) * ROUND_GRANULE
            plan = MsmPlan(n_bits, c, sc.shape[0], rounds)
        return plan, (oy, bs, be)
    if plan is None:
        plan = plan_msm(sc, n_bits, c, point_valid_np)
    return plan, _stream_indices_host(plan, sc, point_valid_np)


def _stream_indices_host(plan: MsmPlan, scalars_np: np.ndarray, point_valid_np):
    """Host (numpy) stream planning: digits, per-window argsort, bucket
    starts. The device-sort variant's XLA program (variadic sort over
    [nw, N]) compiles for many minutes at N ~ 10^6 through the remote
    compile helper, while numpy does the whole plan in seconds — and the
    prover's scalars are host-known anyway. Returns (order_y [nw, N] int32
    with the sign folded as +N, b_start [nw, nb], b_end [nw, nb])."""
    n = plan.n
    nb = plan.nb
    slots, signs = _digits_signed_np(scalars_np, plan)
    key = np.where(slots > 0, slots - 1, nb).astype(np.int64)
    if point_valid_np is not None:
        key = np.where(np.asarray(point_valid_np)[None, :], key, nb)
    order = np.argsort(key, axis=1, kind="stable").astype(np.int32)
    key_sorted = np.take_along_axis(key, order, axis=1)
    sign_sorted = np.take_along_axis(signs, order, axis=1)
    starts = np.stack(
        [np.searchsorted(row, np.arange(nb + 1)) for row in key_sorted]
    ).astype(np.int32)
    order_y = order + np.where(sign_sorted, np.int32(n), np.int32(0)).astype(np.int32)
    return order_y, starts[:, :-1], starts[:, 1:]


def _stream_indices(plan: MsmPlan, scalars, point_valid):
    """Shared stream planning: returns (idx [R*L] int32 point indices,
    sign [R*L] bool, valid [R, L] bool)."""
    n, lanes, rounds = plan.n, plan.lanes, plan.rounds
    slots, signs = _digits_signed_jnp(scalars, plan)
    order_y, order_x, b_start, b_end = _sort_and_starts(slots, signs, point_valid, plan)
    r_idx = jnp.arange(rounds, dtype=jnp.int32)
    pos = b_start[None, :, :] + r_idx[:, None, None]  # [R, nw, nb]
    valid = pos < b_end[None, :, :]
    pos_c = jnp.minimum(pos, n - 1)
    idx_y = jax.vmap(lambda o, p: o[p], in_axes=(0, 1), out_axes=1)(order_y, pos_c)
    idx_flat = idx_y.reshape(-1)
    sign = idx_flat >= n
    idx = jnp.where(sign, idx_flat - n, idx_flat)
    return idx, sign, valid.reshape(rounds, lanes)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _msm_stream_stage(curve, plan: MsmPlan, xs, ys, scalars, point_valid):
    """Stage 1 (device planning): digit recoding, sort, round-stream
    gathers. Used when the scalars only exist on device. Split from the
    accumulate/reduce stages so each XLA module stays small — the
    monolithic graph's server-side compile was OOM-killed at N ~ 10^6."""
    spec = curve.field
    k = spec.n_limbs
    lanes, rounds = plan.lanes, plan.rounds
    idx, sign, valid = _stream_indices(plan, scalars, point_valid)
    ys_neg = L.sub_mod(spec, jnp.zeros_like(ys), ys)
    ys_ext = jnp.concatenate([ys, ys_neg], axis=0)
    idx_y = idx + jnp.where(sign, jnp.int32(plan.n), jnp.int32(0))
    px = xs[idx].reshape(rounds, lanes, k)
    py = ys_ext[idx_y].reshape(rounds, lanes, k)
    px = jnp.transpose(px, (0, 2, 1))  # [R, K, L]
    py = jnp.transpose(py, (0, 2, 1))
    return px, py, valid.astype(jnp.uint32)


RG_ROUNDS = 64  # rounds per gather/accumulate group (host-planned path):
# fixed [RG, K, L] shapes keep every compile unit small and REUSED across
# round counts — the whole-stream gather module OOM-killed the remote
# compile helper at N ~ 1.6M (5GB stream buffers in one XLA module)


def _accum_group_kernel(ax_ref, ay_ref, az_ref, ae_ref, px_ref, py_ref, v_ref,
                        ox_ref, oy_ref, oz_ref, oe_ref, *, mod, n0, one_m):
    """Like _accum_kernel_body but the accumulator arrives via aliased
    input buffers (carried across round groups). Aliasing shares the HBM
    buffers only — the output VMEM blocks start UNINITIALIZED, so the
    carried state must still be seeded from the input refs at the first
    grid round (MSM_AB.json's exc_lanes ~4e9 on hardware was this kernel
    reading garbage before the round-5 seed)."""
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _seed():
        ox_ref[...] = ax_ref[...]
        oy_ref[...] = ay_ref[...]
        oz_ref[...] = az_ref[...]
        oe_ref[...] = ae_ref[...]

    k = ox_ref.shape[0]
    x1 = [ox_ref[j] for j in range(k)]
    y1 = [oy_ref[j] for j in range(k)]
    z1 = [oz_ref[j] for j in range(k)]
    xq = [px_ref[0, j] for j in range(k)]
    yq = [py_ref[0, j] for j in range(k)]
    vq = v_ref[r % 8] != 0
    x3, y3, z3, exc = _k_jac_madd_noexcept(x1, y1, z1, xq, yq, vq, mod, n0, one_m)
    ox_ref[...] = PF._stack(x3)
    oy_ref[...] = PF._stack(y3)
    oz_ref[...] = PF._stack(z3)
    oe_ref[0] = oe_ref[0] | exc.astype(jnp.uint32)


def _accum_scan_kernel(ax_ref, ay_ref, az_ref, ae_ref, px_ref, py_ref, v_ref,
                       ox_ref, oy_ref, oz_ref, oe_ref, *, mod, n0, one_m):
    """_accum_group_kernel without input/output aliasing (scan-body safe):
    the carried accumulator arrives as REGULAR inputs and is copied into
    the output blocks at the first grid round; the outputs then stay
    VMEM-resident across the inner rounds axis (constant index_map)."""
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _seed():
        ox_ref[...] = ax_ref[...]
        oy_ref[...] = ay_ref[...]
        oz_ref[...] = az_ref[...]
        oe_ref[...] = ae_ref[...]

    k = ox_ref.shape[0]
    x1 = [ox_ref[j] for j in range(k)]
    y1 = [oy_ref[j] for j in range(k)]
    z1 = [oz_ref[j] for j in range(k)]
    xq = [px_ref[0, j] for j in range(k)]
    yq = [py_ref[0, j] for j in range(k)]
    vq = v_ref[r % 8] != 0
    x3, y3, z3, exc = _k_jac_madd_noexcept(x1, y1, z1, xq, yq, vq, mod, n0, one_m)
    ox_ref[...] = PF._stack(x3)
    oy_ref[...] = PF._stack(y3)
    oz_ref[...] = PF._stack(z3)
    oe_ref[0] = oe_ref[0] | exc.astype(jnp.uint32)


def _groups_scan_core(curve, plan: MsmPlan, rg: int, xs, ys_ext, order_y,
                      b_start, b_end, n_groups, q_valid=None):
    """Traced core of the grouped MSM accumulation: a fori_loop over round
    groups, each step gathering one [rg, K, L] stream slice and running
    the Pallas bucket kernel. `n_groups` is TRACED, so the compile key is
    (N, c, rg) only — every occupancy at a given size reuses one
    executable. Replaces the Python group loop whose per-group dispatch
    round trips dominated at prover scale (measured ~0.6s/group through
    the remote tunnel — 13.7s for an N=2^20 MSM whose compute is tens
    of ms)."""
    spec = curve.field
    k = spec.n_limbs
    n, lanes = plan.n, plan.lanes
    mod = tuple(int(x) for x in spec.mod_limbs)
    n0 = int(spec.n0inv)
    one_m = tuple(int(x) for x in spec.one_mont_limbs)
    tile = LANE_TILE if lanes % LANE_TILE == 0 else lanes
    ntiles = lanes // tile
    kernel = functools.partial(_accum_scan_kernel, mod=mod, n0=n0, one_m=one_m)
    coord_in = pl.BlockSpec((1, k, tile), lambda j, i: (i, 0, j), memory_space=pltpu.VMEM)
    flag_in = pl.BlockSpec((8, tile), lambda j, i: (i // 8, j), memory_space=pltpu.VMEM)
    coord_acc = pl.BlockSpec((k, tile), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    exc_spec = pl.BlockSpec((8, tile), lambda j, i: (0, j), memory_space=pltpu.VMEM)

    def body(g, carry):
        ax, ay, az, ae = carry
        # gather this group's point stream (same math as _gather_group)
        r_idx = g * rg + jnp.arange(rg, dtype=jnp.int32)
        pos = b_start[None, :, :] + r_idx[:, None, None]
        valid = pos < b_end[None, :, :]
        pos_c = jnp.minimum(pos, n - 1)
        idx_y = jax.vmap(lambda o, p: o[p], in_axes=(0, 1), out_axes=1)(order_y, pos_c)
        idx_flat = idx_y.reshape(-1)
        sign = idx_flat >= n
        idx = jnp.where(sign, idx_flat - n, idx_flat)
        px = jnp.transpose(xs[idx].reshape(rg, lanes, k), (0, 2, 1))
        py = jnp.transpose(ys_ext[idx_flat].reshape(rg, lanes, k), (0, 2, 1))
        v = valid.reshape(rg, lanes)
        if q_valid is not None:
            # per-query invalidity applied at accumulation time — lets one
            # shared sort (from the scalars alone) serve several query
            # tables with different infinity masks
            v = jnp.logical_and(v, q_valid[idx].reshape(rg, lanes))
        v = v.astype(jnp.uint32)
        ax, ay, az, ae = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((k, lanes), jnp.uint32)] * 3
            + [jax.ShapeDtypeStruct((8, lanes), jnp.uint32)],
            grid=(ntiles, rg),
            in_specs=[coord_acc, coord_acc, coord_acc, exc_spec,
                      coord_in, coord_in, flag_in],
            out_specs=[coord_acc] * 3 + [exc_spec],
        )(ax, ay, az, ae, px, py, v)
        return (ax, ay, az, ae)

    ax = jnp.zeros((k, lanes), jnp.uint32)
    ay = jnp.zeros((k, lanes), jnp.uint32)
    az = jnp.zeros((k, lanes), jnp.uint32)
    ae = jnp.zeros((8, lanes), jnp.uint32)
    return jax.lax.fori_loop(0, n_groups, body, (ax, ay, az, ae))


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _msm_groups_scan(curve, plan: MsmPlan, rg: int, xs, ys_ext, order_y,
                     b_start, b_end, n_groups):
    """Host-planned entry to the grouped scan (plans arrive as arrays)."""
    return _groups_scan_core(curve, plan, rg, xs, ys_ext, order_y,
                             b_start, b_end, n_groups)


@functools.partial(jax.jit, static_argnums=(0,))
def _plan_dev(plan: MsmPlan, scalars, plan_valid):
    """Device planning alone: (order_y, b_start, b_end, n_occ). One sort
    (the expensive part — ~620ms at [24, 2^20]) can be shared by every
    MSM over the same scalars (the prover's a/b1/b2 witness queries)."""
    slots, signs = _digits_signed_jnp(scalars, plan)
    order_y, _ox, b_start, b_end = _sort_and_starts(slots, signs, plan_valid, plan)
    occ = jnp.maximum(jnp.max(b_end - b_start), 1)
    return order_y, b_start, b_end, occ


FORI_MAX_N = 1 << 21  # single-program (fori) accumulation is stable and
# dispatch-free up to ~2M points (hardware-exact at 2^17-2^21); above it
# the fori+gather program faults the TPU worker — host-loop groups there


def _msm_device_planned(curve, plan: MsmPlan, rg: int, xs, ys, scalars,
                        point_valid, rounds_cap: int = 0):
    """Fully device-resident MSM: digit recode + bucket sort on device,
    then grouped Pallas accumulation. With a real `rounds_cap` (the
    caller's plan.rounds from actual planning of these scalars) and
    N <= FORI_MAX_N this is ONE fori program with a statically sized
    materialized index stream — zero host syncs; otherwise the occupancy
    syncs to the host once and groups dispatch from a host loop (the fori
    form faults the TPU worker at N ~ 7.2M). No per-MSM host uploads at
    all — host planning shipped a [nw, N] int32 order table through the
    tunnel every call (~100MB at N=2^20, the dominant measured cost),
    while the prover's scalars are either uploaded once per proof
    (witness) or already live in HBM (the h-operand straight out of the
    NTT)."""
    if plan.n <= FORI_MAX_N and rounds_cap and _use_xy():
        return _msm_device_planned_fori_xy(curve, plan, rg, rounds_cap,
                                           xs, ys, scalars, point_valid)
    if plan.n <= FORI_MAX_N and not _use_xy():
        return _msm_device_planned_fori(curve, plan, rg, xs, ys, scalars,
                                        point_valid)
    order_y, b_start, b_end, occ = _plan_dev(plan, scalars, point_valid)
    n_groups = (int(occ) + rg - 1) // rg
    if _use_xy():
        xy = _pack_xy(xs, ys)
        idx_enc = _materialize_stream_j(plan, n_groups * rg, order_y,
                                        b_start, b_end)
        return _run_groups_pk(curve, plan, rg, xy, idx_enc, n_groups)
    ys_ext = _neg_y_ext(curve.field, ys)
    return _run_groups(curve, plan, rg, xs, ys_ext, order_y,
                       b_start, b_end, n_groups)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _msm_device_planned_fori(curve, plan: MsmPlan, rg: int, xs, ys, scalars,
                             point_valid):
    spec = curve.field
    order_y, b_start, b_end, occ = _plan_dev(plan, scalars, point_valid)
    n_groups = (occ + rg - 1) // rg
    ys_ext = jnp.concatenate([ys, L.sub_mod(spec, jnp.zeros_like(ys), ys)], axis=0)
    return _groups_scan_core(curve, plan, rg, xs, ys_ext, order_y,
                             b_start, b_end, n_groups)


def _msm_accum_shared(curve, plan: MsmPlan, rg: int, xs, ys,
                      order_y, b_start, b_end, occ, q_valid,
                      idx_enc=None):
    """Grouped accumulation against a SHARED device plan. On the packed
    path the query's own infinity mask folds into all-zero rows (detected
    in-kernel) and `idx_enc` (the materialized round stream) is reused
    across every query sharing the plan."""
    n_groups = (int(occ) + rg - 1) // rg
    if _use_xy():
        xy = _pack_xy(xs, ys, q_valid=q_valid)
        if idx_enc is None:
            idx_enc = _materialize_stream_j(plan, n_groups * rg, order_y,
                                            b_start, b_end)
        return _run_groups_pk(curve, plan, rg, xy, idx_enc, n_groups)
    ys_ext = _neg_y_ext(curve.field, ys)
    return _run_groups(curve, plan, rg, xs, ys_ext, order_y,
                       b_start, b_end, n_groups, q_valid=q_valid)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _accum_group(curve, plan: MsmPlan, ax, ay, az, ae, px, py, vstream):
    """One RG_ROUNDS group of bucket accumulation; acc buffers donated and
    aliased so the state stays in place across groups."""
    spec = curve.field
    k = spec.n_limbs
    lanes = px.shape[2]
    rg = px.shape[0]
    mod = tuple(int(x) for x in spec.mod_limbs)
    n0 = int(spec.n0inv)
    one_m = tuple(int(x) for x in spec.one_mont_limbs)
    if jax.default_backend() == "cpu" or plan.use_jnp:
        # jnp reference path: unified adds, then merge into the carried acc
        ox, oy, oz, exc = _accumulate_jnp(spec, px, py, vstream)
        from .curve_jax import fp_arith, jac_add

        ar = fp_arith(spec)
        merged = jac_add(ar, (ax.T, ay.T, az.T), (ox.T, oy.T, oz.T))
        return merged[0].T, merged[1].T, merged[2].T, ae | jnp.broadcast_to(exc, ae.shape)

    tile = LANE_TILE if lanes % LANE_TILE == 0 else lanes
    ntiles = lanes // tile
    kernel = functools.partial(_accum_group_kernel, mod=mod, n0=n0, one_m=one_m)
    coord_in = pl.BlockSpec((1, k, tile), lambda j, i: (i, 0, j), memory_space=pltpu.VMEM)
    flag_in = pl.BlockSpec((8, tile), lambda j, i: (i // 8, j), memory_space=pltpu.VMEM)
    coord_acc = pl.BlockSpec((k, tile), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    exc_spec = pl.BlockSpec((8, tile), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    ox, oy, oz, oe = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((k, lanes), jnp.uint32)] * 3
        + [jax.ShapeDtypeStruct((8, lanes), jnp.uint32)],
        grid=(ntiles, rg),
        in_specs=[coord_acc, coord_acc, coord_acc, exc_spec, coord_in, coord_in, flag_in],
        out_specs=[coord_acc] * 3 + [exc_spec],
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
    )(ax, ay, az, ae, px, py, vstream)
    return ox, oy, oz, oe


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _gather_group_masked(curve, plan: MsmPlan, rg: int, xs, ys_ext, order_y,
                         b_start, b_end, q_valid, r0):
    """_gather_group with a per-point query-validity mask folded into the
    round-valid stream (shared-plan MSMs)."""
    spec = curve.field
    k = spec.n_limbs
    n, lanes = plan.n, plan.lanes
    r_idx = r0 + jnp.arange(rg, dtype=jnp.int32)
    pos = b_start[None, :, :] + r_idx[:, None, None]
    valid = pos < b_end[None, :, :]
    pos_c = jnp.minimum(pos, n - 1)
    idx_y = jax.vmap(lambda o, p: o[p], in_axes=(0, 1), out_axes=1)(order_y, pos_c)
    idx_flat = idx_y.reshape(-1)
    sign = idx_flat >= n
    idx = jnp.where(sign, idx_flat - n, idx_flat)
    px = jnp.transpose(xs[idx].reshape(rg, lanes, k), (0, 2, 1))
    py = jnp.transpose(ys_ext[idx_flat].reshape(rg, lanes, k), (0, 2, 1))
    v = valid.reshape(rg, lanes)
    if q_valid is not None:
        v = jnp.logical_and(v, q_valid[idx].reshape(rg, lanes))
    return px, py, v.astype(jnp.uint32)


def _run_groups(curve, gplan: MsmPlan, rg: int, xs, ys_ext, order_y,
                b_start, b_end, n_groups: int, q_valid=None):
    """Grouped accumulation dispatched from a HOST loop: one bounded
    program per round group (gather + Pallas kernel). The fori-wrapped
    single-program form faults the TPU worker at N ~ 7.2M (it is fine at
    <= 2M); per-group programs with a carried accumulator are the stable
    shape on this backend, at ~25ms dispatch cost per group."""
    spec = curve.field
    k = spec.n_limbs
    lanes = gplan.lanes
    ax = jnp.zeros((k, lanes), jnp.uint32)
    ay = jnp.zeros((k, lanes), jnp.uint32)
    az = jnp.zeros((k, lanes), jnp.uint32)
    ae = jnp.zeros((8, lanes), jnp.uint32)
    for g in range(n_groups):
        px, py, v = _gather_group_masked(
            curve, gplan, rg, xs, ys_ext, order_y, b_start, b_end,
            q_valid, jnp.int32(g * rg))
        ax, ay, az, ae = _accum_group(curve, gplan, ax, ay, az, ae, px, py, v)
    return ax, ay, az, ae


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _gather_group(curve, plan: MsmPlan, rg: int, xs, ys_ext, order_y,
                  b_start, b_end, r0):
    """Gather one group of rounds [r0, r0+rg) into [RG, K, L] streams.
    r0 is a traced scalar, so ONE compile serves every group and every
    round count at a given (N, rg, lanes)."""
    spec = curve.field
    k = spec.n_limbs
    n, lanes = plan.n, plan.lanes
    r_idx = r0 + jnp.arange(rg, dtype=jnp.int32)
    pos = b_start[None, :, :] + r_idx[:, None, None]
    valid = pos < b_end[None, :, :]
    pos_c = jnp.minimum(pos, n - 1)
    idx_y = jax.vmap(lambda o, p: o[p], in_axes=(0, 1), out_axes=1)(order_y, pos_c)
    idx_flat = idx_y.reshape(-1)
    sign = idx_flat >= n
    idx = jnp.where(sign, idx_flat - n, idx_flat)
    px = xs[idx].reshape(rg, lanes, k)
    py = ys_ext[idx_flat].reshape(rg, lanes, k)
    px = jnp.transpose(px, (0, 2, 1))
    py = jnp.transpose(py, (0, 2, 1))
    return px, py, valid.reshape(rg, lanes).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnums=0)
def _neg_y_ext(spec: FieldSpec, ys):
    return jnp.concatenate([ys, L.sub_mod(spec, jnp.zeros_like(ys), ys)], axis=0)


# ---------------------------------------------------------------------------
# Packed-row accumulation: ONE [N, K] uint32 row per point carrying BOTH
# affine coordinates — limb j holds x_j | (y_j << 16) (the limbs are 16-bit
# values in uint32 slots, so the high half is free). One 64-byte-row gather
# per point visit instead of two. Measured N=2^20 gather rates (MSM_STAGES):
# [N, 16]u32 rows gather at ~88 Mrows/s while [N, 32] rows drop to ~23 —
# XLA's row gather is per-ROW-cost-bound at 16 columns, so the round-3
# "packed-XY" [N, 2K] layout made gathers 4x slower; this layout keeps the
# fast width AND halves the row count. The digit sign is applied INSIDE the
# kernel (y <- p - y on sign lanes) so no 2N-row ys_ext table is built.
# Flag stream carries bit0 = valid, bit1 = sign.
# ---------------------------------------------------------------------------


def _pack_xy(xs, ys, q_valid=None):
    """[N, K] 16-bit-limb coordinate arrays -> [N, K] packed rows. With
    `q_valid`, invalid points become ALL-ZERO rows — (0,0) is never an
    affine curve point, so the kernel detects them without a per-query
    validity gather (the per-group q_valid[idx] gather cost as much as the
    row gather itself)."""
    xy = xs | (ys << 16)
    if q_valid is not None:
        xy = xy * q_valid.astype(jnp.uint32)[:, None]
    return xy


def _materialize_stream(plan: MsmPlan, rounds: int, order_y, b_start, b_end):
    """Round-major index stream [rounds, lanes] int32, built ONCE per plan:
    entry = the order_y value (sign encoded as +N) or the 2N sentinel when
    the bucket run is exhausted. The per-group order_y[pos] gather costs as
    much as the point-row gather itself (~13ns/element, MSM_STAGES.json);
    materializing it lets every MSM sharing the plan (a/b1/b2) reuse it and
    turns the per-group index fetch into a contiguous slice."""
    n, lanes = plan.n, plan.lanes
    r_idx = jnp.arange(rounds, dtype=jnp.int32)
    pos = b_start[None, :, :] + r_idx[:, None, None]
    valid = pos < b_end[None, :, :]
    pos_c = jnp.minimum(pos, n - 1)
    idx_y = jax.vmap(lambda o, p: o[p], in_axes=(0, 1), out_axes=1)(order_y, pos_c)
    idx_enc = jnp.where(valid, idx_y, jnp.int32(2 * n))
    return idx_enc.reshape(rounds, lanes)


def _gather_rows_pk(plan: MsmPlan, xy, idx_enc):
    """idx_enc [rg, lanes] (order_y value or 2N sentinel) -> packed rows
    [rg, K, lanes] + flag stream [rg, lanes] (bit0 valid, bit1 sign)."""
    n = plan.n
    rg, lanes = idx_enc.shape
    k = xy.shape[1]
    flat = idx_enc.reshape(-1)
    valid = flat < 2 * n
    sign = flat >= n
    row = jnp.where(valid, flat - jnp.where(sign, n, 0), 0)
    pxy = jnp.transpose(xy[row].reshape(rg, lanes, k), (0, 2, 1))
    v = (valid.astype(jnp.uint32)
         | ((sign & valid).astype(jnp.uint32) << 1)).reshape(rg, lanes)
    return pxy, v


def _kernel_xy_step(pxy_ref, v_ref, ox_ref, oy_ref, oz_ref, oe_ref, r,
                    mod, n0, one_m):
    """Shared body of the packed-row kernels: unpack x/y from the 16-bit
    halves, apply the sign, run the mixed add against the VMEM-resident
    accumulator."""
    k = ox_ref.shape[0]
    x1 = [ox_ref[j] for j in range(k)]
    y1 = [oy_ref[j] for j in range(k)]
    z1 = [oz_ref[j] for j in range(k)]
    xq = [pxy_ref[0, j] & jnp.uint32(0xFFFF) for j in range(k)]
    yq = [pxy_ref[0, j] >> 16 for j in range(k)]
    vw = v_ref[r % 8]
    # all-zero rows are per-query invalid points ((0,0) is never on the
    # curve) — masked here instead of gathering a q_valid stream
    nz = pxy_ref[0, 0]
    for j in range(1, k):
        nz = nz | pxy_ref[0, j]
    vq = jnp.logical_and((vw & 1) != 0, nz != 0)
    sq = (vw & 2) != 0
    zero = [jnp.zeros_like(yq[0])] * k
    yneg = PF.k_sub_mod(zero, yq, mod)
    yq = PF.k_select(sq, yneg, yq)
    x3, y3, z3, exc = _k_jac_madd_noexcept(x1, y1, z1, xq, yq, vq, mod, n0, one_m)
    ox_ref[...] = PF._stack(x3)
    oy_ref[...] = PF._stack(y3)
    oz_ref[...] = PF._stack(z3)
    oe_ref[0] = oe_ref[0] | exc.astype(jnp.uint32)


def _accum_scan_kernel_xy(ax_ref, ay_ref, az_ref, ae_ref, pxy_ref, v_ref,
                          ox_ref, oy_ref, oz_ref, oe_ref, *, mod, n0, one_m):
    """Scan-body-safe packed-XY kernel: accumulator arrives as regular
    inputs, copied into the VMEM-resident outputs at round 0."""
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _seed():
        ox_ref[...] = ax_ref[...]
        oy_ref[...] = ay_ref[...]
        oz_ref[...] = az_ref[...]
        oe_ref[...] = ae_ref[...]

    _kernel_xy_step(pxy_ref, v_ref, ox_ref, oy_ref, oz_ref, oe_ref, r,
                    mod, n0, one_m)


def _accum_group_kernel_xy(ax_ref, ay_ref, az_ref, ae_ref, pxy_ref, v_ref,
                           ox_ref, oy_ref, oz_ref, oe_ref, *, mod, n0, one_m):
    """Aliased-buffer packed-XY kernel (host-dispatched group loop).
    Aliasing shares HBM buffers; the output VMEM blocks are NOT
    prefetched, so the carried accumulator must be seeded from the input
    refs at round 0 exactly as _accum_scan_kernel_xy does."""
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _seed():
        ox_ref[...] = ax_ref[...]
        oy_ref[...] = ay_ref[...]
        oz_ref[...] = az_ref[...]
        oe_ref[...] = ae_ref[...]

    _kernel_xy_step(pxy_ref, v_ref, ox_ref, oy_ref, oz_ref, oe_ref, r,
                    mod, n0, one_m)


def _groups_scan_core_xy(curve, plan: MsmPlan, rg: int, xy, idx_enc,
                         n_groups):
    """fori_loop over round groups: contiguous slice of the materialized
    index stream + packed row gather + scan kernel per step. Traced
    n_groups: one executable per (N, c, rg, rounds_cap)."""
    spec = curve.field
    k = spec.n_limbs
    lanes = plan.lanes
    mod = tuple(int(x) for x in spec.mod_limbs)
    n0 = int(spec.n0inv)
    one_m = tuple(int(x) for x in spec.one_mont_limbs)
    tile = LANE_TILE if lanes % LANE_TILE == 0 else lanes
    ntiles = lanes // tile
    kernel = functools.partial(_accum_scan_kernel_xy, mod=mod, n0=n0, one_m=one_m)
    coord_in = pl.BlockSpec((1, k, tile), lambda j, i: (i, 0, j),
                            memory_space=pltpu.VMEM)
    flag_in = pl.BlockSpec((8, tile), lambda j, i: (i // 8, j), memory_space=pltpu.VMEM)
    coord_acc = pl.BlockSpec((k, tile), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    exc_spec = pl.BlockSpec((8, tile), lambda j, i: (0, j), memory_space=pltpu.VMEM)

    def body(g, carry):
        ax, ay, az, ae = carry
        idx_g = jax.lax.dynamic_slice_in_dim(idx_enc, g * rg, rg, axis=0)
        pxy, v = _gather_rows_pk(plan, xy, idx_g)
        ax, ay, az, ae = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((k, lanes), jnp.uint32)] * 3
            + [jax.ShapeDtypeStruct((8, lanes), jnp.uint32)],
            grid=(ntiles, rg),
            in_specs=[coord_acc, coord_acc, coord_acc, exc_spec,
                      coord_in, flag_in],
            out_specs=[coord_acc] * 3 + [exc_spec],
        )(ax, ay, az, ae, pxy, v)
        return (ax, ay, az, ae)

    ax = jnp.zeros((k, lanes), jnp.uint32)
    ay = jnp.zeros((k, lanes), jnp.uint32)
    az = jnp.zeros((k, lanes), jnp.uint32)
    ae = jnp.zeros((8, lanes), jnp.uint32)
    return jax.lax.fori_loop(0, n_groups, body, (ax, ay, az, ae))


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _msm_device_planned_fori_xy(curve, plan: MsmPlan, rg: int, rounds_cap: int,
                                xs, ys, scalars, point_valid):
    """Single-program device-planned MSM. `rounds_cap` is the static round
    bound the stream materializes to: the caller's plan.rounds when real
    planning produced one (the occupancy of these very scalars), else a
    multiple of rg; groups beyond the cap never run because n_groups =
    ceil(occ / rg) <= cap / rg by construction."""
    order_y, b_start, b_end, occ = _plan_dev(plan, scalars, point_valid)
    n_groups = jnp.minimum((occ + rg - 1) // rg, rounds_cap // rg)
    xy = _pack_xy(xs, ys)
    idx_enc = _materialize_stream(plan, rounds_cap, order_y, b_start, b_end)
    return _groups_scan_core_xy(curve, plan, rg, xy, idx_enc, n_groups)


_materialize_stream_j = jax.jit(_materialize_stream,
                                static_argnums=(0, 1))


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _accum_group_step_pk(curve, plan: MsmPlan, rg: int, ax, ay, az, ae,
                         xy, idx_enc, r0):
    """One host-dispatched round group: contiguous index-stream slice +
    packed row gather + aliased kernel in a single program."""
    spec = curve.field
    k = spec.n_limbs
    lanes = plan.lanes
    mod = tuple(int(x) for x in spec.mod_limbs)
    n0 = int(spec.n0inv)
    one_m = tuple(int(x) for x in spec.one_mont_limbs)
    tile = LANE_TILE if lanes % LANE_TILE == 0 else lanes
    ntiles = lanes // tile
    idx_g = jax.lax.dynamic_slice_in_dim(idx_enc, r0, rg, axis=0)
    pxy, v = _gather_rows_pk(plan, xy, idx_g)
    kernel = functools.partial(_accum_group_kernel_xy, mod=mod, n0=n0, one_m=one_m)
    coord_in = pl.BlockSpec((1, k, tile), lambda j, i: (i, 0, j),
                            memory_space=pltpu.VMEM)
    flag_in = pl.BlockSpec((8, tile), lambda j, i: (i // 8, j), memory_space=pltpu.VMEM)
    coord_acc = pl.BlockSpec((k, tile), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    exc_spec = pl.BlockSpec((8, tile), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((k, lanes), jnp.uint32)] * 3
        + [jax.ShapeDtypeStruct((8, lanes), jnp.uint32)],
        grid=(ntiles, rg),
        in_specs=[coord_acc, coord_acc, coord_acc, exc_spec, coord_in, flag_in],
        out_specs=[coord_acc] * 3 + [exc_spec],
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
    )(ax, ay, az, ae, pxy, v)


def _run_groups_pk(curve, gplan: MsmPlan, rg: int, xy, idx_enc,
                   n_groups: int):
    """Host-loop packed grouped accumulation (large N, where the
    single-program fori form faults the TPU worker)."""
    spec = curve.field
    k = spec.n_limbs
    lanes = gplan.lanes
    ax = jnp.zeros((k, lanes), jnp.uint32)
    ay = jnp.zeros((k, lanes), jnp.uint32)
    az = jnp.zeros((k, lanes), jnp.uint32)
    ae = jnp.zeros((8, lanes), jnp.uint32)
    for g in range(n_groups):
        ax, ay, az, ae = _accum_group_step_pk(
            curve, gplan, rg, ax, ay, az, ae, xy, idx_enc, jnp.int32(g * rg))
    return ax, ay, az, ae


def _use_xy() -> bool:
    import os

    return os.environ.get("ZKPOA_MSM_XY", "1") != "0"


# ---------------------------------------------------------------------------
# Packed-XY G2 (Fp2) accumulation — the B2 MSM fast path
#
# The reference's rapidsnark runs its G2 MSM on the same Pippenger core as
# G1 (scripts/g16_prove.sh:246-252 contract); our measured layer-2 long
# pole (PROGRESS_ROUND4.md round-5 leads) was the jnp unified-add tree
# path at ~15+ min/batch vs a few minutes for all four G1 MSMs combined.
# This path reuses the shared sorted round stream (idx_enc) verbatim and
# gathers TWO [N, K] packed tables (c0 and c1 planes, x|y in the 16-bit
# halves) — two fast-width gathers instead of one 4x-slower [N, 2K] row
# (MSM_STAGES.json: 32-column rows gather 4x slower than 16).  Fp2 ops
# compose the same PF limb primitives with Karatsuba (3 mont_muls / mul).
# ---------------------------------------------------------------------------


def _k2_add(a, b, mod):
    return (PF.k_add_mod(a[0], b[0], mod), PF.k_add_mod(a[1], b[1], mod))


def _k2_sub(a, b, mod):
    return (PF.k_sub_mod(a[0], b[0], mod), PF.k_sub_mod(a[1], b[1], mod))


def _k2_dbl(a, mod):
    return (PF.k_dbl_mod(a[0], mod), PF.k_dbl_mod(a[1], mod))


def _k2_mul(a, b, mod, n0):
    """Karatsuba Fp2 mul over u^2 = -1: 3 Montgomery muls."""
    t0 = PF.k_mont_mul(a[0], b[0], mod, n0)
    t1 = PF.k_mont_mul(a[1], b[1], mod, n0)
    t2 = PF.k_mont_mul(PF.k_add_mod(a[0], a[1], mod),
                       PF.k_add_mod(b[0], b[1], mod), mod, n0)
    return (PF.k_sub_mod(t0, t1, mod),
            PF.k_sub_mod(PF.k_sub_mod(t2, t0, mod), t1, mod))


def _k2_sqr(a, mod, n0):
    """(a0+a1)(a0-a1), 2*a0*a1 — 2 Montgomery muls."""
    c0 = PF.k_mont_mul(PF.k_add_mod(a[0], a[1], mod),
                       PF.k_sub_mod(a[0], a[1], mod), mod, n0)
    t = PF.k_mont_mul(a[0], a[1], mod, n0)
    return (c0, PF.k_add_mod(t, t, mod))


def _k2_is_zero(a):
    return jnp.logical_and(PF.k_is_zero(a[0]), PF.k_is_zero(a[1]))


def _k2_select(cond, a, b):
    return (PF.k_select(cond, a[0], b[0]), PF.k_select(cond, a[1], b[1]))


def _k_jac_madd_noexcept_fp2(x1, y1, z1, xq, yq, q_valid, mod, n0, one_m):
    """Fp2 mixed Jacobian add, same statement as _k_jac_madd_noexcept:
    the P == Q doubling case is flagged, not computed."""
    mm = lambda p, q: _k2_mul(p, q, mod, n0)  # noqa: E731
    sq = lambda p: _k2_sqr(p, mod, n0)  # noqa: E731
    z1z1 = sq(z1)
    u2 = mm(xq, z1z1)
    s2 = mm(mm(yq, z1), z1z1)
    h = _k2_sub(u2, x1, mod)
    r = _k2_sub(s2, y1, mod)
    hh = sq(h)
    hhh = mm(h, hh)
    v = mm(x1, hh)
    x3 = _k2_sub(_k2_sub(sq(r), hhh, mod), _k2_dbl(v, mod), mod)
    y3 = _k2_sub(mm(r, _k2_sub(v, x3, mod)), mm(y1, hhh), mod)
    z3 = mm(z1, h)

    p_inf = _k2_is_zero(z1)
    same_x = _k2_is_zero(h)
    same_y = _k2_is_zero(r)
    is_double = jnp.logical_and(jnp.logical_and(same_x, same_y),
                                jnp.logical_not(p_inf))
    is_cancel = jnp.logical_and(same_x, jnp.logical_not(same_y))

    k = len(z3[0])
    zeros = [jnp.zeros_like(z3[0][0])] * k
    zero2 = (zeros, zeros)
    one2 = ([jnp.full_like(z3[0][0], one_m[j]) for j in range(k)], zeros)
    z3 = _k2_select(is_cancel, zero2, z3)
    x3 = _k2_select(p_inf, xq, x3)
    y3 = _k2_select(p_inf, yq, y3)
    z3 = _k2_select(p_inf, one2, z3)
    invalid = jnp.logical_not(q_valid)
    x3 = _k2_select(invalid, x1, x3)
    y3 = _k2_select(invalid, y1, y3)
    z3 = _k2_select(invalid, z1, z3)
    exc = jnp.logical_and(is_double, q_valid)
    return x3, y3, z3, exc


def _pack_xy2(xs, ys, q_valid=None):
    """Fp2 coordinate pytrees ((x0,x1),(y0,y1)), leaves [N, K] 16-bit-limb
    arrays -> two packed tables (c0 plane, c1 plane), x|y in the 16-bit
    halves. Invalid points become all-zero rows in BOTH planes ((0,0) is
    never an affine twist point)."""
    m0 = xs[0] | (ys[0] << 16)
    m1 = xs[1] | (ys[1] << 16)
    if q_valid is not None:
        qv = q_valid.astype(jnp.uint32)[:, None]
        m0 = m0 * qv
        m1 = m1 * qv
    return m0, m1


def _gather_rows_pk2(plan: MsmPlan, xy0, xy1, idx_enc):
    """Two packed-plane gathers against ONE shared index stream slice."""
    n = plan.n
    rg, lanes = idx_enc.shape
    k = xy0.shape[1]
    flat = idx_enc.reshape(-1)
    valid = flat < 2 * n
    sign = flat >= n
    row = jnp.where(valid, flat - jnp.where(sign, n, 0), 0)
    p0 = jnp.transpose(xy0[row].reshape(rg, lanes, k), (0, 2, 1))
    p1 = jnp.transpose(xy1[row].reshape(rg, lanes, k), (0, 2, 1))
    v = (valid.astype(jnp.uint32)
         | ((sign & valid).astype(jnp.uint32) << 1)).reshape(rg, lanes)
    return p0, p1, v


def _kernel_xy2_step(p0_ref, p1_ref, v_ref, ox_ref, oy_ref, oz_ref, oe_ref,
                     r, mod, n0, one_m):
    """Shared body of the packed Fp2 kernels. Accumulator refs are
    [2K, tile]: rows [0, K) = c0 plane, [K, 2K) = c1 plane."""
    k = ox_ref.shape[0] // 2

    def split(ref):
        return ([ref[j] for j in range(k)], [ref[k + j] for j in range(k)])

    x1 = split(ox_ref)
    y1 = split(oy_ref)
    z1 = split(oz_ref)
    xq = ([p0_ref[0, j] & jnp.uint32(0xFFFF) for j in range(k)],
          [p1_ref[0, j] & jnp.uint32(0xFFFF) for j in range(k)])
    yq0 = [p0_ref[0, j] >> 16 for j in range(k)]
    yq1 = [p1_ref[0, j] >> 16 for j in range(k)]
    vw = v_ref[r % 8]
    nz = p0_ref[0, 0]
    for j in range(1, k):
        nz = nz | p0_ref[0, j]
    for j in range(k):
        nz = nz | p1_ref[0, j]
    vq = jnp.logical_and((vw & 1) != 0, nz != 0)
    sgn = (vw & 2) != 0
    zero = [jnp.zeros_like(yq0[0])] * k
    yq0 = PF.k_select(sgn, PF.k_sub_mod(zero, yq0, mod), yq0)
    yq1 = PF.k_select(sgn, PF.k_sub_mod(zero, yq1, mod), yq1)
    x3, y3, z3, exc = _k_jac_madd_noexcept_fp2(
        x1, y1, z1, xq, (yq0, yq1), vq, mod, n0, one_m)
    ox_ref[...] = PF._stack(x3[0] + x3[1])
    oy_ref[...] = PF._stack(y3[0] + y3[1])
    oz_ref[...] = PF._stack(z3[0] + z3[1])
    oe_ref[0] = oe_ref[0] | exc.astype(jnp.uint32)


def _accum_group_kernel_xy2(ax_ref, ay_ref, az_ref, ae_ref, p0_ref, p1_ref,
                            v_ref, ox_ref, oy_ref, oz_ref, oe_ref,
                            *, mod, n0, one_m):
    """Aliased-buffer packed Fp2 kernel (host-dispatched group loop);
    output VMEM blocks seeded from the input refs at round 0 — aliasing
    shares HBM only."""
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _seed():
        ox_ref[...] = ax_ref[...]
        oy_ref[...] = ay_ref[...]
        oz_ref[...] = az_ref[...]
        oe_ref[...] = ae_ref[...]

    _kernel_xy2_step(p0_ref, p1_ref, v_ref, ox_ref, oy_ref, oz_ref, oe_ref,
                     r, mod, n0, one_m)


LANE_TILE2 = 2048  # Fp2 kernel lane tile: 2x the limb rows + ~3x the madd
# temporaries of G1 — half the G1 tile keeps the working set in VMEM


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _accum_group_step_pk2(curve, plan: MsmPlan, rg: int, ax, ay, az, ae,
                          xy0, xy1, idx_enc, r0):
    """One host-dispatched Fp2 round group: shared-stream slice + two
    packed-plane gathers + aliased kernel."""
    spec = curve.field
    k = spec.n_limbs
    lanes = plan.lanes
    mod = tuple(int(x) for x in spec.mod_limbs)
    n0 = int(spec.n0inv)
    one_m = tuple(int(x) for x in spec.one_mont_limbs)
    tile = LANE_TILE2 if lanes % LANE_TILE2 == 0 else lanes
    ntiles = lanes // tile
    idx_g = jax.lax.dynamic_slice_in_dim(idx_enc, r0, rg, axis=0)
    p0, p1, v = _gather_rows_pk2(plan, xy0, xy1, idx_g)
    kernel = functools.partial(_accum_group_kernel_xy2, mod=mod, n0=n0,
                               one_m=one_m)
    coord_in = pl.BlockSpec((1, k, tile), lambda j, i: (i, 0, j),
                            memory_space=pltpu.VMEM)
    flag_in = pl.BlockSpec((8, tile), lambda j, i: (i // 8, j),
                           memory_space=pltpu.VMEM)
    coord_acc = pl.BlockSpec((2 * k, tile), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM)
    exc_spec = pl.BlockSpec((8, tile), lambda j, i: (0, j),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((2 * k, lanes), jnp.uint32)] * 3
        + [jax.ShapeDtypeStruct((8, lanes), jnp.uint32)],
        grid=(ntiles, rg),
        in_specs=[coord_acc, coord_acc, coord_acc, exc_spec,
                  coord_in, coord_in, flag_in],
        out_specs=[coord_acc] * 3 + [exc_spec],
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
    )(ax, ay, az, ae, p0, p1, v)


def _run_groups_pk2(curve, gplan: MsmPlan, rg: int, xy0, xy1, idx_enc,
                    n_groups: int):
    """Host-loop packed Fp2 grouped accumulation (the proven-stable shape
    at prover-scale N — see _msm_device_planned)."""
    spec = curve.field
    k = spec.n_limbs
    lanes = gplan.lanes
    ax = jnp.zeros((2 * k, lanes), jnp.uint32)
    ay = jnp.zeros((2 * k, lanes), jnp.uint32)
    az = jnp.zeros((2 * k, lanes), jnp.uint32)
    ae = jnp.zeros((8, lanes), jnp.uint32)
    for g in range(n_groups):
        ax, ay, az, ae = _accum_group_step_pk2(
            curve, gplan, rg, ax, ay, az, ae, xy0, xy1, idx_enc,
            jnp.int32(g * rg))
    return ax, ay, az, ae


def _msm_accum_shared2(curve, plan: MsmPlan, rg: int, xs, ys,
                       order_y, b_start, b_end, occ, q_valid, idx_enc=None):
    """Shared-plan packed Fp2 accumulation (the B2 MSM against the
    witness plan). Returns raw [2K, lanes] bucket state + exception
    flags; the caller reduces via _reduce_packed_g2 or falls back to the
    unified tree path when a lane flags an in-bucket doubling."""
    n_groups = (int(occ) + rg - 1) // rg
    xy0, xy1 = _pack_xy2(xs, ys, q_valid=q_valid)
    if idx_enc is None:
        idx_enc = _materialize_stream_j(plan, n_groups * rg, order_y,
                                        b_start, b_end)
    return _run_groups_pk2(curve, plan, rg, xy0, xy1, idx_enc, n_groups)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _reduce_packed_g2(curve, plan: MsmPlan, ax, ay, az):
    """[2K, lanes] packed bucket planes -> Fp2 Jacobian bucket pytree ->
    the generic weighted reduce (Horner over windows)."""
    k = curve.field.n_limbs
    nw, nb = plan.nw, plan.nb

    def unp(a):
        return (a[:k].T.reshape(nw, nb, k), a[k:].T.reshape(nw, nb, k))

    return _weighted_reduce(curve, (unp(ax), unp(ay), unp(az)), plan)


def _use_g2_pallas() -> bool:
    import os

    return (jax.default_backend() != "cpu" and _use_xy()
            and os.environ.get("ZKPOA_PALLAS") != "0"
            and os.environ.get("ZKPOA_G2_PALLAS", "1") != "0")


def _msm_host_planned(curve, plan: MsmPlan, xs, ys, host_plan):
    """Grouped gather+accumulate driver for host-planned MSMs: fixed-shape
    compile units regardless of N and round count."""
    import os as _os

    spec = curve.field
    k = spec.n_limbs
    lanes = plan.lanes
    oy_, bs_, be_ = (jnp.asarray(x) for x in host_plan)
    ys_ext = _neg_y_ext(spec, ys)
    rg = min(RG_ROUNDS, plan.rounds)
    # the group/reduce compile keys must NOT vary with the round count —
    # only the scan length does (scan body compiles once per rg shape)
    gplan = MsmPlan(plan.n_bits, plan.c, plan.n, rg, use_jnp=plan.use_jnp)
    if not (
        jax.default_backend() == "cpu"
        or _os.environ.get("ZKPOA_PALLAS") == "0"
        or plan.use_jnp
    ):
        n_groups = (plan.rounds + rg - 1) // rg
        ax, ay, az, ae = _run_groups(
            curve, gplan, rg, xs, ys_ext, oy_, bs_, be_, n_groups
        )
        return _msm_reduce_stage(curve, gplan, ax, ay, az), jnp.any(ae[0])
    ax = jnp.zeros((k, lanes), jnp.uint32)
    ay = jnp.zeros((k, lanes), jnp.uint32)
    az = jnp.zeros((k, lanes), jnp.uint32)
    ae = jnp.zeros((8, lanes), jnp.uint32)
    for r0 in range(0, plan.rounds, rg):
        px, py, v = _gather_group(
            curve, gplan, rg, xs, ys_ext, oy_, bs_, be_, jnp.int32(r0)
        )
        ax, ay, az, ae = _accum_group(curve, gplan, ax, ay, az, ae, px, py, v)
    return _msm_reduce_stage(curve, gplan, ax, ay, az), jnp.any(ae[0])


@functools.partial(jax.jit, static_argnums=(0, 1))
def _msm_gather_stage(curve, plan: MsmPlan, xs, ys, order_y, b_start, b_end):
    """Stage 1 (host planning): gathers only — order/starts computed by
    _stream_indices_host in numpy (the device sort's compile is the
    bottleneck at prover scale, and prover scalars are host-known)."""
    spec = curve.field
    k = spec.n_limbs
    n, lanes, rounds = plan.n, plan.lanes, plan.rounds
    ys_neg = L.sub_mod(spec, jnp.zeros_like(ys), ys)
    ys_ext = jnp.concatenate([ys, ys_neg], axis=0)
    r_idx = jnp.arange(rounds, dtype=jnp.int32)
    pos = b_start[None, :, :] + r_idx[:, None, None]  # [R, nw, nb]
    valid = pos < b_end[None, :, :]
    pos_c = jnp.minimum(pos, n - 1)
    idx_y = jax.vmap(lambda o, p: o[p], in_axes=(0, 1), out_axes=1)(order_y, pos_c)
    idx_flat = idx_y.reshape(-1)
    sign = idx_flat >= n
    idx = jnp.where(sign, idx_flat - n, idx_flat)
    px = xs[idx].reshape(rounds, lanes, k)
    py = ys_ext[idx_flat].reshape(rounds, lanes, k)
    px = jnp.transpose(px, (0, 2, 1))
    py = jnp.transpose(py, (0, 2, 1))
    return px, py, valid.reshape(rounds, lanes).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _msm_accum_stage(curve, plan: MsmPlan, px, py, vstream):
    return _accumulate(curve.field, px, py, vstream, plan)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _msm_reduce_stage(curve, plan: MsmPlan, ox, oy, oz):
    k = curve.field.n_limbs
    nb, nw = plan.nb, plan.nw
    if (
        jax.default_backend() != "cpu"
        and nb >= 128
        and os.environ.get("ZKPOA_PALLAS") != "0"
        and os.environ.get("ZKPOA_REDUCE_PALLAS", "1") != "0"
    ):
        return _weighted_reduce_pallas(curve, plan, ox, oy, oz)

    def unlm(a):
        return a.T.reshape(nw, nb, k)

    return _weighted_reduce(curve, (unlm(ox), unlm(oy), unlm(oz)), plan)


def _msm_fused(curve, plan: MsmPlan, xs, ys, scalars, point_valid,
               host_plan=None):
    """xs, ys: [N, K] Montgomery affine coords; scalars [N, K_s] plain
    limbs; point_valid [N] bool. Single-chunk fused MSM (three jitted
    stages). Returns (jacobian result leaves [K], exception flag count).
    `host_plan` = (order_y, b_start, b_end) from _stream_indices_host —
    skips the device sort entirely (its XLA compile stalls at N ~ 10^6)."""
    if host_plan is not None:
        return _msm_host_planned(curve, plan, xs, ys, host_plan)
    px, py, vstream = _msm_stream_stage(curve, plan, xs, ys, scalars, point_valid)
    ox, oy, oz, exc = _msm_accum_stage(curve, plan, px, py, vstream)
    return _msm_reduce_stage(curve, plan, ox, oy, oz), jnp.any(exc)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _tree_indices_device(curve, plan: MsmPlan, scalars, point_valid):
    idx, sign, valid = _stream_indices(plan, scalars, point_valid)
    return (
        idx.reshape(plan.rounds, plan.lanes),
        sign.reshape(plan.rounds, plan.lanes),
        valid,
    )


@functools.partial(jax.jit, static_argnums=(0, 1))
def _tree_gather_indices(curve, plan: MsmPlan, order_y, b_start, b_end):
    n, lanes, rounds = plan.n, plan.lanes, plan.rounds
    r_idx = jnp.arange(rounds, dtype=jnp.int32)
    pos = b_start[None, :, :] + r_idx[:, None, None]
    valid = pos < b_end[None, :, :]
    pos_c = jnp.minimum(pos, n - 1)
    idx_y = jax.vmap(lambda o, p: o[p], in_axes=(0, 1), out_axes=1)(order_y, pos_c)
    idx_flat = idx_y.reshape(rounds, lanes)
    sign = idx_flat >= n
    idx = jnp.where(sign, idx_flat - n, idx_flat)
    return idx, sign, valid.reshape(rounds, lanes)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _tree_accum_reduce(curve, plan: MsmPlan, xs, ys, idx2, sign2, valid):
    """Pytree-coordinate accumulation + reduce (G2 over Fp2): a lax.scan
    of unified batch-major mixed adds (no Pallas kernel — Fp2 tower ops
    compose the jnp limb substrate)."""
    from .curve_jax import jac_add_affine

    nb, nw, lanes = plan.nb, plan.nw, plan.lanes
    ar = curve.arith()

    def step(acc, xs_in):
        ixr, sgr, vr = xs_in  # [L], [L], [L]
        pxg = _tmap(lambda a: a[ixr], xs)
        pyg = _tmap(lambda a: a[ixr], ys)
        pyg = ar.select(sgr, ar.sub(ar.zeros_like(pyg), pyg), pyg)
        return jac_add_affine(ar, acc, pxg, pyg, vr), None

    acc0 = curve.infinity((lanes,))
    acc, _ = jax.lax.scan(step, acc0, (idx2, sign2, valid))
    buckets = _tmap(lambda a: a.reshape(nw, nb, a.shape[-1]), acc)
    return _weighted_reduce(curve, buckets, plan)


def _tree_device_planned(curve, plan: MsmPlan, rg: int, xs, ys, scalars,
                         point_valid):
    """Device-planned pytree-coordinate MSM (G2 over Fp2): device recode +
    sort, then packed Fp2 Pallas accumulation (unified tree fallback on
    an in-bucket doubling flag or when Pallas is disabled)."""
    order_y, b_start, b_end, occ = _plan_dev(plan, scalars, point_valid)
    if _use_g2_pallas() and isinstance(xs, tuple):
        n_groups = (int(occ) + rg - 1) // rg
        xy0, xy1 = _pack_xy2(xs, ys)
        idx_enc = _materialize_stream_j(plan, n_groups * rg, order_y,
                                        b_start, b_end)
        ax, ay, az, ae = _run_groups_pk2(curve, plan, rg, xy0, xy1,
                                         idx_enc, n_groups)
        if not bool(jnp.any(ae[0])):
            return _reduce_packed_g2(curve, plan, ax, ay, az)
    return _tree_accum_shared(curve, plan, rg, xs, ys,
                              order_y, b_start, b_end, occ, None)


@functools.partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(3,))
def _tree_accum_one_group(curve, plan: MsmPlan, rg: int, acc, xs, ys,
                          order_y, b_start, b_end, q_valid, g):
    """One round group of the pytree (G2) accumulation: gathers + a scan
    of unified adds. Dispatched from a PYTHON loop over groups — a single
    fori program wrapping gathers at N ~ 1.5M faulted the TPU worker
    (same failure class as round 2's chained-fori bench crash); per-group
    programs with a donated carry are the proven-stable shape."""
    from .curve_jax import jac_add_affine

    n, lanes = plan.n, plan.lanes
    ar = curve.arith()
    r_idx = g * rg + jnp.arange(rg, dtype=jnp.int32)
    pos = b_start[None, :, :] + r_idx[:, None, None]
    valid = pos < b_end[None, :, :]
    pos_c = jnp.minimum(pos, n - 1)
    idx_y = jax.vmap(lambda o, p: o[p], in_axes=(0, 1), out_axes=1)(order_y, pos_c)
    idx2 = idx_y.reshape(rg, lanes)
    sign2 = idx2 >= n
    idx2 = jnp.where(sign2, idx2 - n, idx2)
    v2 = valid.reshape(rg, lanes)
    if q_valid is not None:
        v2 = jnp.logical_and(v2, q_valid[idx2])

    def round_step(a, xs_in):
        ixr, sgr, vr = xs_in
        pxg = _tmap(lambda t: t[ixr], xs)
        pyg = _tmap(lambda t: t[ixr], ys)
        pyg = ar.select(sgr, ar.sub(ar.zeros_like(pyg), pyg), pyg)
        return jac_add_affine(ar, a, pxg, pyg, vr), None

    acc, _ = jax.lax.scan(round_step, acc, (idx2, sign2, v2))
    return acc


@functools.partial(jax.jit, static_argnums=(0, 1))
def _tree_reduce(curve, plan: MsmPlan, acc):
    nb, nw = plan.nb, plan.nw
    buckets = _tmap(lambda a: a.reshape(nw, nb, a.shape[-1]), acc)
    return _weighted_reduce(curve, buckets, plan)


def _tree_accum_shared(curve, plan: MsmPlan, rg: int, xs, ys,
                       order_y, b_start, b_end, occ, q_valid):
    """Pytree (G2) grouped accumulation against a shared device plan:
    a host loop of per-group programs (see _tree_accum_one_group)."""
    n_groups = (int(occ) + rg - 1) // rg
    acc = curve.infinity((plan.lanes,))
    for g in range(n_groups):
        acc = _tree_accum_one_group(
            curve, plan, rg, acc, xs, ys, order_y, b_start, b_end,
            q_valid, jnp.int32(g))
    return _tree_reduce(curve, plan, acc)


def _use_device_plan(plan: Optional[MsmPlan]) -> bool:
    import os

    return (
        jax.default_backend() != "cpu"
        and (plan is None or not plan.use_jnp)
        and os.environ.get("ZKPOA_HOST_PLAN") != "1"
    )


def _msm_fused_tree(curve, plan: MsmPlan, xs, ys, scalars, point_valid,
                    host_plan=None):
    if host_plan is not None:
        oy_, bs_, be_ = host_plan
        idx2, sign2, valid = _tree_gather_indices(
            curve, plan, jnp.asarray(oy_), jnp.asarray(bs_), jnp.asarray(be_)
        )
    else:
        idx2, sign2, valid = _tree_indices_device(curve, plan, scalars, point_valid)
    return _tree_accum_reduce(curve, plan, xs, ys, idx2, sign2, valid)


def msm_tpu(
    curve,
    xs,
    ys,
    scalars_limbs: np.ndarray,
    n_bits: int = 254,
    c: int = 11,
    point_valid: Optional[jnp.ndarray] = None,
    plan: Optional[MsmPlan] = None,
):
    """Fused-kernel MSM. xs/ys [N, K] Montgomery affine device arrays,
    scalars_limbs host numpy [N, 16] plain limbs. Returns a Jacobian point
    pytree (leaves [K]).

    The fast kernel skips the P == Q doubling case (impossible when the
    input points are distinct, as zkey/table points are); if any bucket
    lane flags it, the MSM transparently re-runs through the unified jnp
    accumulator (ZKPOA_PALLAS=0 semantics)."""
    import os

    n = int(xs.shape[0])
    if point_valid is None:
        point_valid = jnp.ones((n,), dtype=bool)
    if _use_device_plan(plan) and os.environ.get("ZKPOA_PALLAS") != "0":
        nb_ = plan.n_bits if plan else n_bits
        c_ = plan.c if plan else c
        geo = MsmPlan(nb_, c_, n, RG_ROUNDS)
        # a caller-provided plan carries the true occupancy bound of these
        # scalars: the fori path can materialize its index stream at that
        # static size and run with zero host syncs
        cap = 0
        if plan is not None and plan.rounds > 0:
            cap = ((plan.rounds + RG_ROUNDS - 1) // RG_ROUNDS) * RG_ROUNDS
        sc_dev = jnp.asarray(scalars_limbs)
        ax, ay, az, ae = _msm_device_planned(
            curve, geo, RG_ROUNDS, xs, ys, sc_dev, point_valid,
            rounds_cap=cap)
        if bool(jnp.any(ae[0])):
            # in-bucket P == Q doubling: re-run through the unified path
            sc_np = np.asarray(scalars_limbs)
            slow, host_plan = plan_and_stream(
                sc_np, nb_, c_, np.asarray(point_valid))
            slow = MsmPlan(slow.n_bits, slow.c, slow.n, slow.rounds, use_jnp=True)
            res, _ = _msm_fused(curve, slow, xs, ys,
                                jnp.zeros((1, 1), jnp.uint32),
                                point_valid, host_plan)
            return res
        return _msm_reduce_stage(curve, geo, ax, ay, az)

    host_scalars = isinstance(scalars_limbs, np.ndarray)
    pv = None if point_valid is None else np.asarray(point_valid)
    host_plan = None
    if host_scalars and (plan.n if plan else len(scalars_limbs)) >= HOST_PLAN_MIN_N:
        plan, host_plan = plan_and_stream(scalars_limbs, n_bits, c, pv, plan=plan)
    elif plan is None:
        plan = plan_msm(np.asarray(scalars_limbs), n_bits, c, pv)
    # with a host plan the device never needs the scalars themselves
    sc_dev = (
        jnp.zeros((1, 1), jnp.uint32) if host_plan is not None
        else jnp.asarray(scalars_limbs)
    )
    res, exc = _msm_fused(curve, plan, xs, ys, sc_dev, point_valid, host_plan)
    if jax.default_backend() != "cpu" and not plan.use_jnp and int(exc) != 0:
        slow = MsmPlan(plan.n_bits, plan.c, plan.n, plan.rounds, use_jnp=True)
        res, _ = _msm_fused(curve, slow, xs, ys, sc_dev, point_valid, host_plan)
    return res


TREE_BLOCK = 8192  # fixed block width of the repeated-scalar tree sum
HEAVY_COUNT_MIN = 256  # scalar values repeated at least this often split out


@functools.partial(jax.jit, static_argnums=0)
def _lane_fold(curve, p):
    """Sum a [TREE_BLOCK] Jacobian lane array to lane 0 by masked-roll
    halving on the FIXED shape (one add-kernel compile)."""
    lanes = jax.tree.leaves(p)[0].shape[0]
    steps = lanes.bit_length() - 1
    pos = jnp.arange(lanes, dtype=jnp.int32)

    def body(t, p):
        sh = lanes >> (t + 1)
        rolled = _tmap(lambda a: jnp.roll(a, -sh, axis=0), p)
        keep = pos < sh
        leaf = jax.tree.leaves(p)[0]
        inf = curve.infinity((leaf.shape[0],))
        shifted = _tmap(lambda a, b: jnp.where(keep[..., None], a, b), rolled, inf)
        return curve.add(p, shifted)

    return jax.lax.fori_loop(0, steps, body, p)


def _tree_sum_subset(curve, xs, ys, idx_np: np.ndarray):
    """Exact sum of points[idx] via fixed-width blocked adds + one lane
    fold: every compile unit has shape [TREE_BLOCK] regardless of subset
    size. Returns a host affine point (None = infinity)."""
    b = TREE_BLOCK
    n_idx = len(idx_np)
    pad = (-n_idx) % b
    idx = np.concatenate([idx_np.astype(np.int64), np.full(pad, -1, np.int64)])
    acc = curve.infinity((b,))
    for off in range(0, len(idx), b):
        blk = idx[off : off + b]
        valid = jnp.asarray(blk >= 0)
        safe = jnp.asarray(np.maximum(blk, 0))
        xg = _tmap(lambda a: a[safe], xs)
        yg = _tmap(lambda a: a[safe], ys)
        acc = curve.add_affine(acc, xg, yg, valid)
    folded = _lane_fold(curve, acc)
    one = _tmap(lambda a: a[:1], folded)
    return curve.decode_jac(one)[0]


def msm_tpu_heavy_split(curve, query, scalars_limbs: np.ndarray, host_add,
                        host_mul, c: Optional[int] = None,
                        use_tree: bool = False, scalars_dev=None):
    """Witness-grade MSM: scalar VALUES repeated >= HEAVY_COUNT_MIN times
    (about half of all circuit wires hold bit values, so the value 1 shows
    up ~10^6 times) would each pile into a single Pippenger bucket and
    blow the round bound to the repeat count (observed: 647k rounds at
    N = 1.6M). Heavy values are split out and tree-summed at fixed shapes;
    the rest goes through the normal host-planned kernel. `query` is a
    DeviceG1Points-like object (xs, ys, valid). Returns a host affine
    point."""
    pv = np.asarray(query.valid)
    n = scalars_limbs.shape[0]
    # upload host-spilled query tables ONCE for this MSM (no-op when the
    # key is already device-resident); freed when this function returns
    q_xs = jax.tree.map(jnp.asarray, query.xs)
    q_ys = jax.tree.map(jnp.asarray, query.ys)
    uniq, inverse, counts = np.unique(
        scalars_limbs, axis=0, return_inverse=True, return_counts=True
    )
    heavy = np.where(counts >= HEAVY_COUNT_MIN)[0]
    main_mask = pv.copy()
    extra = None
    for u in heavy:
        val = 0
        for j in range(uniq.shape[1] - 1, -1, -1):
            val = (val << LIMB_BITS) | int(uniq[u, j])
        if val == 0:
            continue  # zero scalars are already free (digit 0)
        sel = np.where((inverse == u) & pv)[0]
        main_mask[sel] = False
        ssum = _tree_sum_subset(curve, q_xs, q_ys, sel)
        if ssum is not None:
            contrib = host_mul(ssum, val) if val != 1 else ssum
            extra = host_add(extra, contrib) if extra is not None else contrib
    if c is None:
        c = auto_c(n)
    msm_fn = msm_tpu_tree if use_tree else msm_tpu
    sc = scalars_dev if scalars_dev is not None else scalars_limbs
    res = msm_fn(curve, q_xs, q_ys, sc, c=c,
                 point_valid=jnp.asarray(main_mask))
    out = curve.decode_jac(_tmap(lambda a: a[None], res))[0]
    if extra is not None:
        out = host_add(out, extra) if out is not None else extra
    return out


class WitnessMsmPlan:
    """Shared device plan + heavy-value analysis for several query tables
    over the SAME scalar vector — the prover's a/b1/b2 witness MSMs pay
    ONE digit recode + bucket sort (the sort is ~0.6s at 2^20) instead of
    three. Per-query infinity masks apply at accumulation time."""

    def __init__(self, geo, order_y, b_start, b_end, occ, heavy, scalars_np):
        self.geo = geo
        self.order_y = order_y
        self.b_start = b_start
        self.b_end = b_end
        self.occ = occ
        self.heavy = heavy  # [(value, np indices)] repeated-value terms
        self.scalars_np = scalars_np  # kept for the rare unified fallback
        self._idx_enc = None  # materialized round stream, built on first use

    def idx_enc(self, rg: int):
        """Round-major index stream, materialized once and shared by every
        query MSM over these scalars (a/b1/b2)."""
        if self._idx_enc is None:
            assert self.order_y is not None, "order table already freed"
            n_groups = (int(self.occ) + rg - 1) // rg
            self._idx_enc = _materialize_stream_j(
                self.geo, n_groups * rg, self.order_y, self.b_start,
                self.b_end)
        return self._idx_enc

    def free_order_y(self, rg: int = RG_ROUNDS) -> None:
        """Low-HBM mode: materialize the index stream, then drop the
        [nw, N] device order table it was built from (~1.1 GB at a 15M-
        wire key — idle HBM through every accumulation). The rare
        in-bucket-doubling fallbacks re-plan from scalars_np on the host
        instead of reusing the device plan."""
        self.idx_enc(rg)
        self.order_y = None


def plan_witness_msms(scalars_limbs: np.ndarray, scalars_dev,
                      c: Optional[int] = None) -> WitnessMsmPlan:
    """Heavy-value analysis (host) + ONE device plan for all query tables
    sharing these scalars."""
    n = scalars_limbs.shape[0]
    if c is None:
        c = auto_c(n)
    uniq, inverse, counts = np.unique(
        scalars_limbs, axis=0, return_inverse=True, return_counts=True
    )
    mask = np.ones(n, dtype=bool)
    heavy = []
    for u in np.where(counts >= HEAVY_COUNT_MIN)[0]:
        val = 0
        for j in range(uniq.shape[1] - 1, -1, -1):
            val = (val << LIMB_BITS) | int(uniq[u, j])
        sel = np.where(inverse == u)[0]
        mask[sel] = False
        if val != 0:
            heavy.append((val, sel))
    geo = MsmPlan(254, c, n, RG_ROUNDS)
    oy, bs, be, occ = _plan_dev(geo, scalars_dev, jnp.asarray(mask))
    return WitnessMsmPlan(geo, oy, bs, be, occ, heavy, scalars_limbs)


MAX_REPAIR_LANES = 4096  # above: in-bucket doublings are no longer "rare"


def _host_neg_affine(pt):
    """Host negation of an affine point over Fp (G1) or Fp2 (G2)."""
    from ..fields.bn254 import P as _P

    x, y = pt
    if isinstance(y, tuple):
        return (x, tuple((_P - c) % _P for c in y))
    return (x, (_P - y) % _P)


def _host_rows_decode(curve, coord, rows):
    """Decode query-table rows (Montgomery limb arrays, host numpy or
    device) to host ints. `coord` is one coordinate pytree: a [N, K]
    array (Fp) or a tuple of two (Fp2)."""
    spec = curve.field

    def one(arr):
        a = np.asarray(arr)[rows]
        plain = np.asarray(spec.from_mont(jnp.asarray(a)))
        return [int(v) for v in spec.from_limbs(plain)]

    if isinstance(coord, tuple):
        c0, c1 = one(coord[0]), one(coord[1])
        return [(a, b) for a, b in zip(c0, c1)]
    return one(coord)


def _repair_exc_lanes(curve, wplan: WitnessMsmPlan, query, qv_np, ae,
                      host_add, host_mul, prefix_pad: int):
    """Exact host repair for bucket lanes whose fast-kernel accumulation
    flagged an in-bucket P == Q doubling (possible when distinct wires
    share an identical query point AND an identical sub-heavy witness
    value — observed on the 15.2M-wire layer-3 a-query, where many
    congruence product wires legitimately share one column row's
    A-polynomial). The flagged lanes' device state is garbage; their
    TRUE bucket sums are recomputed on the host from a bit-identical
    host plan and returned as one weighted host-point contribution,
    while the caller zeroes those lanes before the reduce. The previous
    whole-query unified fallback re-ran the full MSM (minutes) and
    double-allocated HBM (RESOURCE_EXHAUSTED at 15M wires).

    Returns (flagged_lane_indices ndarray, host point or None)."""
    geo = wplan.geo
    flagged = np.flatnonzero(np.asarray(ae[0]))
    cached = getattr(wplan, "_host_plan", None)
    if cached is None:
        mask = np.ones(geo.n, dtype=bool)
        for _val, sel in wplan.heavy:
            mask[sel] = False
        _p, cached = plan_and_stream(
            wplan.scalars_np, geo.n_bits, geo.c, mask, plan=geo)
        wplan._host_plan = cached  # shared across the proof's 4 queries
    oy, bs, be = cached
    nb, n = geo.nb, geo.n
    extra = None
    for lane in flagged.tolist():
        w, b = divmod(int(lane), nb)
        members = oy[w][bs[w, b]:be[w, b]]
        idxs, signs = [], []
        for enc in np.asarray(members).tolist():
            sign = enc >= n
            i = enc - n if sign else enc
            if not qv_np[i]:
                continue
            idxs.append(i - prefix_pad)
            signs.append(sign)
        s_pt = None
        if idxs:
            rows = np.asarray(idxs, dtype=np.int64)
            xs_i = _host_rows_decode(curve, query.xs, rows)
            ys_i = _host_rows_decode(curve, query.ys, rows)
            for x, y, sg in zip(xs_i, ys_i, signs):
                pt = (x, y)
                if sg:
                    pt = _host_neg_affine(pt)
                s_pt = pt if s_pt is None else host_add(s_pt, pt)
        if s_pt is None:
            continue
        # slot -> digit value (must mirror the planner's top-window alias
        # layout: block path key = (d-1)*top_block + chunk, stride path
        # key = (d-1) + top_stride*chunk)
        if w == geo.nw - 1 and geo.top_block:
            d = b // geo.top_block + 1
        elif w == geo.nw - 1 and geo.spread > 1:
            d = (b % geo.top_stride) + 1
        else:
            d = b + 1
        contrib = host_mul(s_pt, d << (geo.c * w))
        extra = contrib if extra is None else host_add(extra, contrib)
    return flagged, extra


def _zero_lanes(arrs, flagged):
    idx = jnp.asarray(flagged)
    return [a.at[:, idx].set(0) for a in arrs]


def msm_shared(curve, query, wplan: WitnessMsmPlan, host_add, host_mul,
               use_tree: bool = False, prefix_pad: int = 0):
    """One query-table MSM against a shared witness plan. Returns a host
    affine point (None = infinity) — same contract as
    msm_tpu_heavy_split.

    `prefix_pad` aligns a query table that only covers a SUFFIX of the
    witness (the C-query skips the n_public+1 public wires) with the
    full-witness plan: the table is front-padded with invalid rows, so
    the public wires' scalars meet zero points and the whole MSM shares
    the one plan + materialized stream instead of re-sorting."""
    if jax.default_backend() == "cpu" and not use_tree:
        # the Pallas accumulation core is TPU-only; CPU (tests) takes the
        # unified per-query path
        scal = wplan.scalars_np[prefix_pad:] if prefix_pad else wplan.scalars_np
        return msm_tpu_heavy_split(
            curve, query, scal, host_add, host_mul,
            c=wplan.geo.c, use_tree=use_tree)
    pv = np.asarray(query.valid)
    q_xs = jax.tree.map(jnp.asarray, query.xs)
    q_ys = jax.tree.map(jnp.asarray, query.ys)
    if prefix_pad:
        pv = np.concatenate([np.zeros(prefix_pad, dtype=pv.dtype), pv])
        zpad = lambda a: jnp.concatenate(  # noqa: E731
            [jnp.zeros((prefix_pad,) + a.shape[1:], a.dtype), a], axis=0)
        q_xs = jax.tree.map(zpad, q_xs)
        q_ys = jax.tree.map(zpad, q_ys)
    extra = None
    for val, sel in wplan.heavy:
        sel_v = sel[pv[sel]]  # heavy indices are full-witness positions;
        # with prefix_pad the padded table is aligned to the same space
        ssum = _tree_sum_subset(curve, q_xs, q_ys, sel_v)
        if ssum is not None:
            contrib = host_mul(ssum, val) if val != 1 else ssum
            extra = host_add(extra, contrib) if extra is not None else contrib
    qv = jnp.asarray(pv)
    if use_tree:
        res = None
        # the packed-plane path is Fp2-specific: coordinates must be
        # (c0, c1) tuples (G2). use_tree=True with plain-array (G1)
        # coordinates — the unified-add escape hatch — stays on the
        # tree path (hw_check stage 5 exercises exactly that).
        if _use_g2_pallas() and isinstance(q_xs, tuple):
            ax, ay, az, ae = _msm_accum_shared2(
                curve, wplan.geo, RG_ROUNDS, q_xs, q_ys,
                wplan.order_y, wplan.b_start, wplan.b_end, wplan.occ, qv,
                idx_enc=wplan.idx_enc(RG_ROUNDS))
            flagged = np.flatnonzero(np.asarray(ae[0]))
            if len(flagged) == 0:
                res = _reduce_packed_g2(curve, wplan.geo, ax, ay, az)
            elif len(flagged) <= MAX_REPAIR_LANES:
                flagged, rep = _repair_exc_lanes(
                    curve, wplan, query, pv, ae, host_add, host_mul,
                    prefix_pad)
                ax, ay, az = _zero_lanes([ax, ay, az], flagged)
                res = _reduce_packed_g2(curve, wplan.geo, ax, ay, az)
                if rep is not None:
                    extra = rep if extra is None else host_add(extra, rep)
        if res is None:
            if wplan.order_y is None:
                # low-HBM mode dropped the device order table: host-plan
                scal = (wplan.scalars_np[prefix_pad:] if prefix_pad
                        else wplan.scalars_np)
                return msm_tpu_heavy_split(
                    curve, query, scal, host_add, host_mul,
                    c=wplan.geo.c, use_tree=True)
            res = _tree_accum_shared(
                curve, wplan.geo, RG_ROUNDS, q_xs, q_ys,
                wplan.order_y, wplan.b_start, wplan.b_end, wplan.occ, qv)
    else:
        ax, ay, az, ae = _msm_accum_shared(
            curve, wplan.geo, RG_ROUNDS, q_xs, q_ys,
            wplan.order_y, wplan.b_start, wplan.b_end, wplan.occ, qv,
            idx_enc=wplan.idx_enc(RG_ROUNDS) if _use_xy() else None)
        flagged = np.flatnonzero(np.asarray(ae[0]))
        if len(flagged):
            # in-bucket doubling (possible when distinct wires share an
            # identical query point AND an identical sub-heavy witness
            # value — routinely true for congruence product wires at the
            # 15M-wire layer-3): repair just the flagged lanes on host
            if len(flagged) <= MAX_REPAIR_LANES:
                flagged, rep = _repair_exc_lanes(
                    curve, wplan, query, pv, ae, host_add, host_mul,
                    prefix_pad)
                ax, ay, az = _zero_lanes([ax, ay, az], flagged)
                if rep is not None:
                    extra = rep if extra is None else host_add(extra, rep)
            else:
                # pathological count: whole-query unified fallback
                scal = (wplan.scalars_np[prefix_pad:] if prefix_pad
                        else wplan.scalars_np)
                return msm_tpu_heavy_split(
                    curve, query, scal, host_add, host_mul,
                    c=wplan.geo.c, use_tree=use_tree)
        res = _msm_reduce_stage(curve, wplan.geo, ax, ay, az)
    out = curve.decode_jac(_tmap(lambda a: a[None], res))[0]
    if extra is not None:
        out = host_add(out, extra) if out is not None else extra
    return out


def msm_tpu_tree(
    curve,
    xs,
    ys,
    scalars_limbs,
    n_bits: int = 254,
    c: int = 11,
    point_valid: Optional[jnp.ndarray] = None,
    plan: Optional[MsmPlan] = None,
):
    """Pytree-coordinate MSM (G2): same planning as msm_tpu, jnp unified-
    add accumulation (handles every exceptional case, no fallback)."""
    n = int(jax.tree.leaves(xs)[0].shape[0])
    if point_valid is None:
        point_valid = jnp.ones((n,), dtype=bool)
    if _use_device_plan(plan):
        nb_ = plan.n_bits if plan else n_bits
        c_ = plan.c if plan else c
        geo = MsmPlan(nb_, c_, n, RG_ROUNDS)
        return _tree_device_planned(
            curve, geo, RG_ROUNDS, xs, ys, jnp.asarray(scalars_limbs),
            point_valid)

    host_scalars = isinstance(scalars_limbs, np.ndarray)
    pv = None if point_valid is None else np.asarray(point_valid)
    host_plan = None
    if host_scalars and (plan.n if plan else len(scalars_limbs)) >= HOST_PLAN_MIN_N:
        plan, host_plan = plan_and_stream(scalars_limbs, n_bits, c, pv, plan=plan)
    elif plan is None:
        plan = plan_msm(np.asarray(scalars_limbs), n_bits, c, pv)
    sc_dev = (
        jnp.zeros((1, 1), jnp.uint32) if host_plan is not None
        else jnp.asarray(scalars_limbs)
    )
    return _msm_fused_tree(curve, plan, xs, ys, sc_dev, point_valid, host_plan)


@functools.partial(jax.jit, static_argnums=0)
def _occupancy_dev(plan: MsmPlan, scalars, point_valid):
    slots, _ = _digits_signed_jnp(scalars, plan)
    slots = jnp.where(point_valid[None, :], slots, 0)
    counts = jax.vmap(
        lambda row: jnp.zeros((plan.nb + 1,), jnp.int32).at[row].add(1)
    )(slots)
    return counts[:, 1:].max()


def plan_msm_device(
    scalars_dev: jnp.ndarray,
    n_bits: int = 254,
    c: int = 11,
    point_valid: Optional[jnp.ndarray] = None,
) -> MsmPlan:
    """plan_msm for device-resident scalars (e.g. the h-operand straight
    out of the NTT): occupancy is computed on-device, one scalar fetch."""
    n = scalars_dev.shape[0]
    probe = MsmPlan(n_bits, c, n, ROUND_GRANULE)
    if point_valid is None:
        point_valid = jnp.ones((n,), dtype=bool)
    occ = max(int(_occupancy_dev(probe, scalars_dev, point_valid)), 1)
    rounds = ((occ + ROUND_GRANULE - 1) // ROUND_GRANULE) * ROUND_GRANULE
    return MsmPlan(n_bits, c, n, rounds)


def auto_c(n: int) -> int:
    """Window size by problem size (all values coprime-ish to 254 so the
    top window never carries out: 254 % c != 0)."""
    if n < 4096:
        return 5
    if n < 65536:
        return 8
    return 11


def scalars_to_limbs_fast(scalars, n_limbs: int = 16) -> np.ndarray:
    """Vectorized host int -> 16-bit-limb conversion (np.frombuffer over a
    byte join — ~50x the per-limb Python loop of msm.scalars_to_limbs)."""
    blob = b"".join(int(s).to_bytes(2 * n_limbs, "little") for s in scalars)
    arr = np.frombuffer(blob, dtype="<u2").reshape(len(scalars), n_limbs)
    return arr.astype(np.uint32)
