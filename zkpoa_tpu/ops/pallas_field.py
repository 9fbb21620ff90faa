"""Fused Pallas TPU kernels for limb field arithmetic and Jacobian curve ops.

Why: the jnp substrate (zkpoa_tpu.ops.limbs / curve_jax) lowers every
Montgomery multiply to ~100 separate elementwise HBM passes (lax.scan over
limbs), so a point add costs ~30 round trips of the whole batch through HBM.
These kernels keep the entire CIOS multiply — and the ENTIRE point-addition
formula (~20 multiplies) — resident in VMEM: one HBM read of the operands,
one write of the result (pallas_guide.md: fuse into VMEM, batch in lanes).

Layout: kernels run limb-major [K, B] so the batch dimension fills the
128-wide lanes and the K=16 limb rows sit in sublanes; the public wrappers
accept the codebase's batch-major [..., K] arrays and transpose at the
boundary (one cheap pass vs the ~100 saved).

All math is exact uint32 integer arithmetic — same deferred-carry CIOS and
branchless exceptional-case handling as the jnp path, verified against it
in tests (interpret mode on CPU, real kernels on TPU).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import LIMB_BITS, LIMB_MASK, FieldSpec

MASK = None  # set lazily inside kernels (traced constant)
TILE_B = 512  # lane-tile of the batch axis


def _rows(x):
    """[K, TB] -> list of K [TB] rows (clean unrolled register-style code)."""
    return [x[i] for i in range(x.shape[0])]


def _stack(rows):
    return jnp.stack(rows, axis=0)


# ---------------------------------------------------------------------------
# In-kernel field primitives on lists of [TB] uint32 rows
# ---------------------------------------------------------------------------


def k_mont_mul(a: List, b: List, mod: Sequence[int], n0inv: int) -> List:
    """CIOS Montgomery product, fully unrolled. a, b: K rows."""
    k = len(a)
    mask = jnp.uint32(LIMB_MASK)
    n0 = jnp.uint32(n0inv)
    zero = jnp.zeros_like(a[0])
    t = [zero] * (k + 1)
    for i in range(k):
        bi = b[i]
        for j in range(k):
            p = a[j] * bi
            t[j] = t[j] + (p & mask)
            t[j + 1] = t[j + 1] + (p >> LIMB_BITS)
        m = ((t[0] & mask) * n0) & mask
        for j in range(k):
            q = jnp.uint32(mod[j]) * m
            t[j] = t[j] + (q & mask)
            t[j + 1] = t[j + 1] + (q >> LIMB_BITS)
        carry = t[0] >> LIMB_BITS
        t = t[1:] + [zero]
        t[0] = t[0] + carry
    return _k_normalize_reduce(t, mod)


def _k_normalize_reduce(t: List, mod: Sequence[int]) -> List:
    """Carry-normalize k+1 accumulator rows, then conditional subtract p."""
    k = len(t) - 1
    mask = jnp.uint32(LIMB_MASK)
    carry = jnp.zeros_like(t[0])
    limbs = []
    for j in range(k):
        v = t[j] + carry
        limbs.append(v & mask)
        carry = v >> LIMB_BITS
    extra = t[k] + carry
    return _k_cond_sub_p(limbs, extra, mod)


def _k_cond_sub_p(limbs: List, extra, mod: Sequence[int]) -> List:
    k = len(limbs)
    mask = jnp.uint32(LIMB_MASK)
    borrow = jnp.zeros_like(limbs[0])
    diff = []
    for j in range(k):
        v = limbs[j] + jnp.uint32(LIMB_MASK + 1) - jnp.uint32(mod[j]) - borrow
        diff.append(v & mask)
        borrow = 1 - (v >> LIMB_BITS)
    use_diff = jnp.logical_or(extra > 0, borrow == 0)
    return [jnp.where(use_diff, d, l) for d, l in zip(diff, limbs)]


def k_add_mod(a: List, b: List, mod: Sequence[int]) -> List:
    k = len(a)
    mask = jnp.uint32(LIMB_MASK)
    carry = jnp.zeros_like(a[0])
    limbs = []
    for j in range(k):
        v = a[j] + b[j] + carry
        limbs.append(v & mask)
        carry = v >> LIMB_BITS
    return _k_cond_sub_p(limbs, carry, mod)


def k_sub_mod(a: List, b: List, mod: Sequence[int]) -> List:
    """(a - b) mod p via (a + p) - b with one fused carry/borrow chain."""
    k = len(a)
    mask = jnp.uint32(LIMB_MASK)
    carry = jnp.zeros_like(a[0])  # carry from (a + p)
    borrow = jnp.zeros_like(a[0])
    limbs = []
    for j in range(k):
        v = a[j] + jnp.uint32(mod[j]) + carry
        ap_j = v & mask
        carry = v >> LIMB_BITS
        d = ap_j + jnp.uint32(LIMB_MASK + 1) - b[j] - borrow
        limbs.append(d & mask)
        borrow = 1 - (d >> LIMB_BITS)
    extra = carry - borrow  # value = limbs + extra*2^(16K), in [0, 2p)
    return _k_cond_sub_p(limbs, extra, mod)


def k_dbl_mod(a: List, mod: Sequence[int]) -> List:
    return k_add_mod(a, a, mod)


def k_is_zero(a: List):
    nz = a[0]
    for r in a[1:]:
        nz = nz | r
    return nz == 0


def k_select(cond, a: List, b: List) -> List:
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


# ---------------------------------------------------------------------------
# In-kernel Jacobian point ops (lists of coordinate rows)
# ---------------------------------------------------------------------------


def _k_jac_double(x, y, z, mod, n0inv):
    mm = lambda p, q: k_mont_mul(p, q, mod, n0inv)
    a = mm(x, x)
    b = mm(y, y)
    c = mm(b, b)
    d0 = k_add_mod(x, b, mod)
    d1 = mm(d0, d0)
    d2 = k_sub_mod(d1, k_add_mod(a, c, mod), mod)
    d = k_dbl_mod(d2, mod)
    e = k_add_mod(k_dbl_mod(a, mod), a, mod)
    f = mm(e, e)
    x3 = k_sub_mod(f, k_dbl_mod(d, mod), mod)
    c8 = k_dbl_mod(k_dbl_mod(k_dbl_mod(c, mod), mod), mod)
    y3 = k_sub_mod(mm(e, k_sub_mod(d, x3, mod)), c8, mod)
    z3 = k_dbl_mod(mm(y, z), mod)
    return x3, y3, z3


def _k_jac_add_affine(x1, y1, z1, xq, yq, q_valid, mod, n0inv, one_mont):
    """Unified mixed add (q affine with z=1 implied), branchless."""
    mm = lambda p, q: k_mont_mul(p, q, mod, n0inv)
    z1z1 = mm(z1, z1)
    u2 = mm(xq, z1z1)
    s2 = mm(mm(yq, z1), z1z1)
    h = k_sub_mod(u2, x1, mod)
    r = k_sub_mod(s2, y1, mod)
    hh = mm(h, h)
    hhh = mm(h, hh)
    v = mm(x1, hh)
    x3 = k_sub_mod(k_sub_mod(mm(r, r), hhh, mod), k_dbl_mod(v, mod), mod)
    y3 = k_sub_mod(mm(r, k_sub_mod(v, x3, mod)), mm(y1, hhh), mod)
    z3 = mm(z1, h)

    p_inf = k_is_zero(z1)
    same_x = k_is_zero(h)
    same_y = k_is_zero(r)
    is_double = jnp.logical_and(same_x, same_y)
    is_cancel = jnp.logical_and(same_x, jnp.logical_not(same_y))

    dx, dy, dz = _k_jac_double(x1, y1, z1, mod, n0inv)
    zero = [jnp.zeros_like(z3[0])] * len(z3)
    one = [jnp.full_like(z3[0], one_mont[j]) for j in range(len(z3))]

    x3 = k_select(is_double, dx, x3)
    y3 = k_select(is_double, dy, y3)
    z3 = k_select(is_double, dz, z3)
    z3 = k_select(is_cancel, zero, z3)
    x3 = k_select(p_inf, xq, x3)
    y3 = k_select(p_inf, yq, y3)
    z3 = k_select(p_inf, one, z3)
    invalid = jnp.logical_not(q_valid)
    x3 = k_select(invalid, x1, x3)
    y3 = k_select(invalid, y1, y3)
    z3 = k_select(invalid, z1, z3)
    return x3, y3, z3


def _k_jac_add(x1, y1, z1, x2, y2, z2, mod, n0inv):
    """Unified full Jacobian add, branchless."""
    mm = lambda p, q: k_mont_mul(p, q, mod, n0inv)
    z1z1 = mm(z1, z1)
    z2z2 = mm(z2, z2)
    u1 = mm(x1, z2z2)
    u2 = mm(x2, z1z1)
    s1 = mm(mm(y1, z2), z2z2)
    s2 = mm(mm(y2, z1), z1z1)
    h = k_sub_mod(u2, u1, mod)
    r = k_sub_mod(s2, s1, mod)
    hh = mm(h, h)
    hhh = mm(h, hh)
    v = mm(u1, hh)
    x3 = k_sub_mod(k_sub_mod(mm(r, r), hhh, mod), k_dbl_mod(v, mod), mod)
    y3 = k_sub_mod(mm(r, k_sub_mod(v, x3, mod)), mm(s1, hhh), mod)
    z3 = mm(mm(z1, z2), h)

    p_inf = k_is_zero(z1)
    q_inf = k_is_zero(z2)
    same_x = k_is_zero(h)
    same_y = k_is_zero(r)
    is_double = jnp.logical_and(jnp.logical_and(same_x, same_y),
                                jnp.logical_not(jnp.logical_or(p_inf, q_inf)))
    is_cancel = jnp.logical_and(same_x, jnp.logical_not(same_y))

    dx, dy, dz = _k_jac_double(x1, y1, z1, mod, n0inv)
    zero = [jnp.zeros_like(z3[0])] * len(z3)

    x3 = k_select(is_double, dx, x3)
    y3 = k_select(is_double, dy, y3)
    z3 = k_select(is_double, dz, z3)
    z3 = k_select(is_cancel, zero, z3)
    only_q = jnp.logical_and(jnp.logical_not(p_inf), q_inf)
    x3 = k_select(only_q, x1, x3)
    y3 = k_select(only_q, y1, y3)
    z3 = k_select(only_q, z1, z3)
    x3 = k_select(p_inf, x2, x3)
    y3 = k_select(p_inf, y2, y3)
    z3 = k_select(p_inf, z2, z3)
    return x3, y3, z3


# ---------------------------------------------------------------------------
# pallas_call wrappers (limb-major blocks, batch tiled in lanes)
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pad_to_tile(x2d: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    """[K, B] -> [K, B_pad] with B_pad a TILE_B multiple."""
    b = x2d.shape[1]
    b_pad = max(TILE_B, ((b + TILE_B - 1) // TILE_B) * TILE_B)
    if b_pad != b:
        x2d = jnp.pad(x2d, ((0, 0), (0, b_pad - b)))
    return x2d, b


def _to_lm(x: jnp.ndarray) -> Tuple[jnp.ndarray, tuple]:
    """batch-major [..., K] -> limb-major [K, B]; returns batch shape."""
    batch_shape = x.shape[:-1]
    k = x.shape[-1]
    return x.reshape(-1, k).T, batch_shape


def _from_lm(x2d: jnp.ndarray, batch_shape: tuple, b: int) -> jnp.ndarray:
    return x2d[:, :b].T.reshape(batch_shape + (x2d.shape[0],))


@functools.partial(jax.jit, static_argnums=0)
def mont_mul_tpu(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Drop-in mont_mul with a fused pallas kernel ([..., K] API)."""
    mod = tuple(int(x) for x in spec.mod_limbs)
    n0 = int(spec.n0inv)
    a2, bs = _to_lm(a)
    b2, _ = _to_lm(jnp.broadcast_to(b, a.shape))
    a2, n_orig = _pad_to_tile(a2)
    b2, _ = _pad_to_tile(b2)
    k = spec.n_limbs

    def kernel(a_ref, b_ref, o_ref):
        out = k_mont_mul(_rows(a_ref[:]), _rows(b_ref[:]), mod, n0)
        o_ref[:] = _stack(out)

    nb = a2.shape[1] // TILE_B
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(a2.shape, jnp.uint32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((k, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(a2, b2)
    return _from_lm(out, bs, n_orig)


def _point_call(kernel_body, spec: FieldSpec, arrays_km: List[jnp.ndarray],
                flags: List[jnp.ndarray], n_out: int):
    """Shared driver: arrays_km are [K, B_pad] coords, flags are [B_pad]
    uint32 (0/1) rows."""
    k = spec.n_limbs
    b_pad = arrays_km[0].shape[1]
    nb = b_pad // TILE_B
    coord_spec = pl.BlockSpec((k, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM)
    flag_spec = pl.BlockSpec((1, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM)
    in_specs = [coord_spec] * len(arrays_km) + [flag_spec] * len(flags)
    out = pl.pallas_call(
        kernel_body,
        out_shape=[jax.ShapeDtypeStruct((k, b_pad), jnp.uint32)] * n_out,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[coord_spec] * n_out,
        interpret=_interpret(),
    )(*arrays_km, *[f.reshape(1, -1) for f in flags])
    return out


@functools.partial(jax.jit, static_argnums=0)
def jac_add_affine_tpu(spec: FieldSpec, p, xq, yq, q_valid):
    """Fused unified mixed add. p = (x, y, z) batch-major [..., K];
    xq, yq [..., K]; q_valid bool [...]."""
    mod = tuple(int(x) for x in spec.mod_limbs)
    n0 = int(spec.n0inv)
    one_m = tuple(int(x) for x in spec.one_mont_limbs)

    coords = []
    bs = None
    for arr in (*p, xq, yq):
        a2, bs = _to_lm(arr)
        a2, n_orig = _pad_to_tile(a2)
        coords.append(a2)
    val2, _ = _pad_to_tile(q_valid.astype(jnp.uint32).reshape(1, -1))

    def kernel(x1r, y1r, z1r, xqr, yqr, vr, ox, oy, oz):
        x3, y3, z3 = _k_jac_add_affine(
            _rows(x1r[:]), _rows(y1r[:]), _rows(z1r[:]),
            _rows(xqr[:]), _rows(yqr[:]), vr[0] != 0, mod, n0, one_m
        )
        ox[:] = _stack(x3)
        oy[:] = _stack(y3)
        oz[:] = _stack(z3)

    ox, oy, oz = _point_call(kernel, spec, coords, [val2[0]], 3)
    return tuple(_from_lm(o, bs, n_orig) for o in (ox, oy, oz))


@functools.partial(jax.jit, static_argnums=0)
def jac_add_tpu(spec: FieldSpec, p, q):
    mod = tuple(int(x) for x in spec.mod_limbs)
    n0 = int(spec.n0inv)
    coords = []
    bs = None
    for arr in (*p, *q):
        a2, bs = _to_lm(arr)
        a2, n_orig = _pad_to_tile(a2)
        coords.append(a2)

    def kernel(x1r, y1r, z1r, x2r, y2r, z2r, ox, oy, oz):
        x3, y3, z3 = _k_jac_add(
            _rows(x1r[:]), _rows(y1r[:]), _rows(z1r[:]),
            _rows(x2r[:]), _rows(y2r[:]), _rows(z2r[:]), mod, n0
        )
        ox[:] = _stack(x3)
        oy[:] = _stack(y3)
        oz[:] = _stack(z3)

    ox, oy, oz = _point_call(kernel, spec, coords, [], 3)
    return tuple(_from_lm(o, bs, n_orig) for o in (ox, oy, oz))


@functools.partial(jax.jit, static_argnums=0)
def jac_double_tpu(spec: FieldSpec, p):
    mod = tuple(int(x) for x in spec.mod_limbs)
    n0 = int(spec.n0inv)
    coords = []
    bs = None
    for arr in p:
        a2, bs = _to_lm(arr)
        a2, n_orig = _pad_to_tile(a2)
        coords.append(a2)

    def kernel(x1r, y1r, z1r, ox, oy, oz):
        x3, y3, z3 = _k_jac_double(
            _rows(x1r[:]), _rows(y1r[:]), _rows(z1r[:]), mod, n0
        )
        ox[:] = _stack(x3)
        oy[:] = _stack(y3)
        oz[:] = _stack(z3)

    ox, oy, oz = _point_call(kernel, spec, coords, [], 3)
    return tuple(_from_lm(o, bs, n_orig) for o in (ox, oy, oz))
