"""Multi-scalar multiplication (Pippenger) on TPU — the core proving kernel.

Replaces rapidsnark's CPU MSMs (the dominant cost of Groth16 proving,
SURVEY.md §2.5/§6: ~1 min per 58M-constraint proof on 32 cores). Design is
XLA-first rather than a translation of CPU/GPU bucket scatters:

  * windows: scalars split into `c`-bit digits; ALL windows are processed
    simultaneously as a leading axis (nw ~ 20 for 254-bit scalars, c=13),
    so the device always has nw * 2^c independent bucket lanes in flight.
  * conflict-free accumulation: points are argsorted by digit per window;
    bucket b's points are then contiguous, and round r adds the r-th point
    of every (window, bucket) pair at once — a gather + one batched
    branchless mixed add per round. Rounds = max bucket occupancy (a
    dynamic `lax.while_loop` bound), ~N/2^c for uniform scalars. Total
    group-add work is N per window — Pippenger-optimal — with no scatter.
  * bucket reduction: sum_b b*B_b = sum_{b>=1} suffix_b, computed with a
    Hillis-Steele suffix scan over the bucket axis (log2(2^c) batched adds)
    followed by a log-depth tree reduce.
  * window combine: Horner over windows (fori_loop: c doublings + 1 add per
    window — sequential but tiny).

Coordinates are pytrees (arrays for G1, (c0, c1) tuples for G2), so the same
kernel drives both the G1 MSMs (pi_A, pi_C, h-query) and the G2 MSM (pi_B).

Multi-chip: points are sharded over the mesh; each shard runs this kernel
and the (tiny) per-shard results are combined with jac_add after an
all-gather (zkpoa_tpu.parallel.mesh).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as L

DEFAULT_WINDOW_BITS = 13


def _tmap(fn, *trees):
    return jax.tree.map(fn, *trees)


def _extract_digits(scalars: jnp.ndarray, n_bits: int, c: int) -> jnp.ndarray:
    """scalars: plain (non-Montgomery) 16-bit limbs uint32 [N, K_s] ->
    digits uint32 [nw, N], digit_w = (s >> (c*w)) & (2^c - 1). Requires c <= 16."""
    assert c <= L.LIMB_BITS
    nw = (n_bits + c - 1) // c
    mask = jnp.uint32((1 << c) - 1)
    ks = scalars.shape[-1]
    digs = []
    for w in range(nw):
        off = c * w
        limb, sh = divmod(off, L.LIMB_BITS)
        word = scalars[:, limb] >> sh
        if sh > 0 and limb + 1 < ks:
            word = word | (scalars[:, limb + 1] << (L.LIMB_BITS - sh))
        digs.append(word & mask)
    return jnp.stack(digs, axis=0)


def msm_impl(
    curve,
    xs,  # coordinate pytree, leaves [N, K] Montgomery limbs
    ys,
    scalars: jnp.ndarray,  # [N, K_s] plain limbs
    n_bits: int = 254,
    c: int = DEFAULT_WINDOW_BITS,
    point_valid: Optional[jnp.ndarray] = None,  # [N] bool; None = all valid
    static_rounds: Optional[int] = None,
):
    """Returns sum_i scalars[i] * P_i as a single Jacobian point (batch ()).
    Un-jitted body — call msm_device (jitted) or use inside shard_map.

    `static_rounds`: compile-time bound on the max bucket occupancy. The
    host-facing msm() computes the exact occupancy from the (host-known)
    scalars and rounds it up to a power of two, so the accumulation loop
    is a static fori_loop. A data-dependent while_loop bound costs ~20ms
    PER ITERATION on the axon tunnel backend (measured 764ms vs 54ms for
    an 8k-point MSM) and is only used when scalars live on device and no
    bound is provided (sharded/fixed-base internal paths)."""
    n = scalars.shape[0]
    nw = (n_bits + c - 1) // c
    n_buckets = 1 << c

    digits = _extract_digits(scalars, n_bits, c)  # [nw, N]
    if point_valid is not None:
        digits = jnp.where(point_valid[None, :], digits, 0)

    order = jnp.argsort(digits, axis=1, stable=True)  # [nw, N]
    sorted_digits = jnp.take_along_axis(digits, order, axis=1)

    bucket_ids = jnp.arange(n_buckets + 1, dtype=jnp.uint32)
    starts = jax.vmap(lambda row: jnp.searchsorted(row, bucket_ids, side="left"))(
        sorted_digits
    )  # [nw, 2^c + 1]
    b_start = starts[:, :-1]
    b_end = starts[:, 1:]

    acc = curve.infinity((nw, n_buckets))
    bucket_axis = jnp.arange(n_buckets, dtype=b_start.dtype)[None, :]

    def round_step(r, acc):
        pos = b_start + r  # [nw, 2^c]
        valid = jnp.logical_and(pos < b_end, bucket_axis != 0)
        pos_c = jnp.minimum(pos, n - 1).astype(jnp.int32)
        pt_idx = jnp.take_along_axis(order, pos_c, axis=1)  # [nw, 2^c]
        xg = _tmap(lambda a: a[pt_idx], xs)  # leaves [nw, 2^c, K]
        yg = _tmap(lambda a: a[pt_idx], ys)
        return curve.add_affine(acc, xg, yg, valid)

    if static_rounds is not None:
        acc = jax.lax.fori_loop(
            0, int(static_rounds), lambda r, a: round_step(r.astype(b_start.dtype), a), acc
        )
    else:
        counts = b_end - b_start
        counts = counts.at[:, 0].set(0)  # bucket 0 contributes nothing
        max_rounds = jnp.max(counts)
        _, acc = jax.lax.while_loop(
            lambda s: s[0] < max_rounds,
            lambda s: (s[0] + 1, round_step(s[0], s[1])),
            (jnp.zeros((), dtype=max_rounds.dtype), acc),
        )

    # --- weighted bucket reduction: sum_b b * B_b = sum_{b>=1} suffix_b ---
    # Both reductions are Hillis-Steele suffix scans with constant shapes
    # (single add graph inside a fori_loop -> small compile).
    inf_all = curve.infinity((nw, n_buckets))
    bpos = jnp.arange(n_buckets, dtype=jnp.int32)[None, :]

    def suffix_scan(p):
        def step(st, p):
            s = jnp.int32(1) << st
            rolled = _tmap(lambda cd: jnp.roll(cd, -s, axis=1), p)
            valid = jnp.broadcast_to(bpos + s < n_buckets, (nw, n_buckets))
            shifted = _tmap(
                lambda a, b: jnp.where(valid[..., None], a, b), rolled, inf_all
            )
            return curve.add(p, shifted)

        return jax.lax.fori_loop(0, c, step, p)

    suffix = suffix_scan(acc)  # suffix[:, b] = sum_{b' >= b} acc[b']
    # zero out bucket 0 (its weight is 0), then a second suffix scan's
    # column 0 is sum_{b >= 1} suffix_b = sum_b b * acc_b.
    mask0 = jnp.broadcast_to(bpos == 0, (nw, n_buckets))
    suffix = _tmap(lambda a, b: jnp.where(mask0[..., None], b, a), suffix, inf_all)
    dsuffix = suffix_scan(suffix)
    window_totals = _tmap(lambda cd: cd[:, 0], dsuffix)  # leaves [nw, ...]

    # --- Horner combine over windows, high window first (fori_loop) ---
    res = _tmap(lambda cd: cd[nw - 1], window_totals)

    def horner_body(i, res):
        w = nw - 2 - i
        res = jax.lax.fori_loop(0, c, lambda _, p: curve.double(p), res)
        wt = _tmap(lambda cd: cd[w], window_totals)
        return curve.add(res, wt)

    if nw > 1:
        res = jax.lax.fori_loop(0, nw - 1, horner_body, res)
    return res


msm_device = jax.jit(
    msm_impl, static_argnums=(0, 4, 5), static_argnames=("static_rounds",)
)


def _tree_sum_device_impl(curve, xs, ys, valid):
    """Plain sum of n_pad (pow2) affine points: log2(n) halving passes of
    batched jacobian adds — static shapes, worst-case-proof. Used for
    degenerate MSM scalar classes (e.g. the ~50% of witness wires holding
    bit values): sum-of-points needs no buckets at all."""
    n = valid.shape[0]
    w = curve.add_affine(curve.infinity((n,)), xs, ys, valid)
    while n > 1:
        half = n // 2
        w = curve.add(
            _tmap(lambda a: a[:half], w), _tmap(lambda a: a[half : 2 * half], w)
        )
        n = half
    return _tmap(lambda a: a[0], w)


_tree_sum_device = jax.jit(_tree_sum_device_impl, static_argnums=(0,))


def tree_sum(curve, points):
    """Host API: exact sum of a list of affine points (None = infinity)."""
    if not points:
        return None
    n_pad = max(64, 1 << (len(points) - 1).bit_length())
    xs, ys, valid = curve.encode_affine(points)
    pad = n_pad - len(points)
    if pad:
        xs = _tmap(lambda a: jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]), xs)
        ys = _tmap(lambda a: jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]), ys)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), dtype=valid.dtype)])
    res = _tree_sum_device(curve, xs, ys, valid)
    return curve.decode_jac(_tmap(lambda a: a[None], res))[0]


def host_occupancy(scalars_limbs: np.ndarray, n_bits: int, c: int) -> int:
    """Exact max bucket occupancy over all windows (numpy, host) — the
    static round bound for the accumulation loop. Bucket 0 excluded."""
    nw = (n_bits + c - 1) // c
    mask = (1 << c) - 1
    occ = 1
    for w in range(nw):
        off = c * w
        limb, sh = divmod(off, L.LIMB_BITS)
        word = scalars_limbs[:, limb] >> sh
        if sh > 0 and limb + 1 < scalars_limbs.shape[1]:
            word = word | (scalars_limbs[:, limb + 1] << (L.LIMB_BITS - sh))
        digits = word & mask
        counts = np.bincount(digits, minlength=mask + 1)
        counts[0] = 0
        occ = max(occ, int(counts.max()))
    return occ


def scalars_to_limbs(scalars, n_limbs: int = 16) -> np.ndarray:
    sc = np.zeros((len(scalars), n_limbs), dtype=np.uint32)
    for i, s in enumerate(scalars):
        s = int(s)
        for j in range(n_limbs):
            sc[i, j] = (s >> (L.LIMB_BITS * j)) & L.LIMB_MASK
    return sc


def _host_add_for(curve):
    """Host group-add for the curve ops object (exact Python ints)."""
    from ..fields import bn254

    name = curve.field.name
    if name == "bn254_fq":
        # G1 (CurveOps over Fp) vs G2 (G2Ops over Fp2) share the field spec;
        # distinguish by the ops type
        from .fp2_jax import G2Ops

        return bn254.g2_add if isinstance(curve, G2Ops) else bn254.g1_add
    if name == "secp256k1_fq":
        from ..fields import secp256k1

        return secp256k1.add
    raise ValueError(f"no host add for curve field {name}")


def host_msm(curve, points, scalars, c: int = 8):
    """Exact host Pippenger (Python ints). Used as the small-N path on the
    CPU backend, where compiling the device kernel costs more than the MSM."""
    add = _host_add_for(curve)
    n_bits = 256
    nw = (n_bits + c - 1) // c
    result = None
    for w in range(nw - 1, -1, -1):
        if result is not None:
            for _ in range(c):
                result = add(result, result)
        buckets = [None] * (1 << c)
        for pt, s in zip(points, scalars):
            if pt is None:
                continue
            d = (int(s) >> (c * w)) & ((1 << c) - 1)
            if d:
                buckets[d] = add(buckets[d], pt)
        run = None
        acc = None
        for b in range((1 << c) - 1, 0, -1):
            run = add(run, buckets[b])
            acc = add(acc, run)
        result = add(result, acc)
    return result


HOST_MSM_MAX_N_CPU = 1 << 14


def auto_window_bits(n: int) -> int:
    """Pippenger window size balancing accumulation rounds (~N/2^c per
    window) against the 2*c*2^c suffix-scan bucket reduction."""
    return max(2, min(DEFAULT_WINDOW_BITS, n.bit_length() - 4))


GROUP_SUM_MIN = 64  # repeated-scalar groups at least this big get tree-summed


def msm(
    curve,
    points,
    scalars,
    n_bits: int = 254,
    c: Optional[int] = None,
    min_pad: int = 64,
):
    """Host-friendly MSM: points = list of affine points (ints for G1,
    int-pairs for G2; None = infinity), scalars = list of ints.

    Host preprocessing (scalars are always host-known in the prover):
      * zero scalars / infinity points dropped;
      * scalar-1 points (about half of all witness wires are bits) and any
        scalar value repeated >= GROUP_SUM_MIN times are summed with the
        static tree kernel — Pippenger buckets degenerate on repeats;
      * the exact max bucket occupancy of what remains is computed here
        and rounded up to a power of two -> a STATIC accumulation bound
        (a data-dependent while_loop costs ~20ms/round on the tunnel).
    Inputs are padded to the next power of two (>= min_pad) so repeated
    calls of similar sizes reuse one compiled kernel."""
    if len(points) != len(scalars):
        raise ValueError("points/scalars length mismatch")
    if not points:
        return None
    n = len(points)
    if jax.default_backend() == "cpu" and n <= HOST_MSM_MAX_N_CPU:
        # device-kernel compiles dwarf the MSM itself at this size on CPU
        return host_msm(curve, points, [int(s) for s in scalars])

    add = _host_add_for(curve)
    # --- host preprocessing: split degenerate scalar classes -------------
    from collections import defaultdict

    groups = defaultdict(list)
    main_pts, main_scs = [], []
    for pt, s in zip(points, scalars):
        s = int(s)
        if pt is None or s == 0:
            continue
        groups[s].append(pt)
    extra = None  # jac-free host accumulation of group contributions
    for s, pts in groups.items():
        if s == 1 or len(pts) >= GROUP_SUM_MIN:
            gsum = tree_sum(curve, pts)
            if gsum is not None:
                if s != 1:
                    # re-feed s * (group sum) as one Pippenger input
                    main_pts.append(gsum)
                    main_scs.append(s)
                else:
                    extra = add(extra, gsum) if extra is not None else gsum
        else:
            main_pts.extend(pts)
            main_scs.extend([s] * len(pts))

    if not main_pts:
        return extra
    n = len(main_pts)
    n_pad = max(min_pad, 1 << (n - 1).bit_length())
    if c is None:
        c = auto_window_bits(n_pad)
    xs, ys, valid = curve.encode_affine(main_pts)
    if n_pad > n:
        pad = n_pad - n
        xs = _tmap(lambda a: jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]), xs)
        ys = _tmap(lambda a: jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]), ys)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), dtype=valid.dtype)])
    sc = np.zeros((n_pad, curve.field.n_limbs), dtype=np.uint32)
    sc[:n] = scalars_to_limbs(main_scs, curve.field.n_limbs)
    occ = host_occupancy(sc, n_bits, c)
    rounds = 1 << (occ - 1).bit_length()  # pow2 -> few compile variants
    res = msm_device(
        curve, xs, ys, jnp.asarray(sc), n_bits, c,
        point_valid=valid, static_rounds=rounds,
    )
    out = curve.decode_jac(_tmap(lambda a: a[None], res))[0]
    if extra is not None:
        out = add(out, extra)
    return out
