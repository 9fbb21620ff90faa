"""Batched elliptic-curve arithmetic on TPU (JAX limb substrate).

Jacobian-coordinate point ops for short-Weierstrass curves with a = 0
(BN254 G1: y^2=x^3+3, secp256k1: y^2=x^3+7), fully branchless so they
vectorize over arbitrary batch dims: exceptional cases (infinity inputs,
P == Q, P == -Q) are computed alongside and folded in with selects, the
standard SIMD-crypto trick. These ops are the inner loop of the Pippenger
MSM (zkpoa_tpu.ops.msm) that replaces rapidsnark's CPU MSMs
(SURVEY.md §2.5 "rapidsnark prover" row).

Points: (x, y, z) uint32 limb arrays [..., K] in Montgomery form;
infinity <=> z == 0. Affine points use z == 1 (Montgomery one).

G2 (Fp2 coordinates) composes these same formulas over the Fp2 limb ops in
zkpoa_tpu.ops.fp2_jax via the generic `Arith` indirection below.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as L
from .limbs import FieldSpec


class Arith(NamedTuple):
    """Field-arithmetic vtable so the same curve formulas serve Fp (limb
    arrays) and Fp2 (pairs of limb arrays)."""

    add: Callable
    sub: Callable
    mul: Callable
    sqr: Callable
    dbl: Callable  # x+x (cheaper than mul by 2)
    is_zero: Callable
    select: Callable  # (cond_batch, a, b)
    zeros_like: Callable
    one_like: Callable  # multiplicative identity broadcast to a's shape


def fp_arith(spec: FieldSpec) -> Arith:
    one_mont = jnp.asarray(spec.one_mont_limbs)
    return Arith(
        add=lambda a, b: L.add_mod(spec, a, b),
        sub=lambda a, b: L.sub_mod(spec, a, b),
        mul=lambda a, b: L.mont_mul(spec, a, b),
        sqr=lambda a: L.mont_mul(spec, a, a),
        dbl=lambda a: L.add_mod(spec, a, a),
        is_zero=L.is_zero,
        select=L.select,
        zeros_like=jnp.zeros_like,
        one_like=lambda a: jnp.broadcast_to(one_mont, a.shape),
    )


# A Jacobian point is a (x, y, z) tuple of field elements.
Jac = Tuple[Any, Any, Any]


def jac_double(ar: Arith, p: Jac) -> Jac:
    """dbl-2009-l (a=0). Handles infinity (z=0 -> z3=0) and y=0 naturally."""
    x, y, z = p
    a = ar.sqr(x)
    b = ar.sqr(y)
    c = ar.sqr(b)
    d = ar.sub(ar.sqr(ar.add(x, b)), ar.add(a, c))
    d = ar.dbl(d)
    e = ar.add(ar.dbl(a), a)
    f = ar.sqr(e)
    x3 = ar.sub(f, ar.dbl(d))
    c8 = ar.dbl(ar.dbl(ar.dbl(c)))
    y3 = ar.sub(ar.mul(e, ar.sub(d, x3)), c8)
    z3 = ar.dbl(ar.mul(y, z))
    return (x3, y3, z3)


def jac_add(ar: Arith, p: Jac, q: Jac) -> Jac:
    """Unified Jacobian add: correct for all inputs (branchless selects)."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    z1z1 = ar.sqr(z1)
    z2z2 = ar.sqr(z2)
    u1 = ar.mul(x1, z2z2)
    u2 = ar.mul(x2, z1z1)
    s1 = ar.mul(ar.mul(y1, z2), z2z2)
    s2 = ar.mul(ar.mul(y2, z1), z1z1)
    h = ar.sub(u2, u1)
    r = ar.sub(s2, s1)
    hh = ar.sqr(h)
    hhh = ar.mul(h, hh)
    v = ar.mul(u1, hh)
    x3 = ar.sub(ar.sub(ar.sqr(r), hhh), ar.dbl(v))
    y3 = ar.sub(ar.mul(r, ar.sub(v, x3)), ar.mul(s1, hhh))
    z3 = ar.mul(ar.mul(z1, z2), h)
    out = (x3, y3, z3)

    p_inf = ar.is_zero(z1)
    q_inf = ar.is_zero(z2)
    same_x = ar.is_zero(h)
    same_y = ar.is_zero(r)
    is_double = jnp.logical_and(same_x, same_y)
    is_cancel = jnp.logical_and(same_x, jnp.logical_not(same_y))

    dbl = jac_double(ar, p)
    zero = ar.zeros_like(z3)

    def sel3(cond, a3, b3):
        return tuple(ar.select(cond, ac, bc) for ac, bc in zip(a3, b3))

    out = sel3(is_double, dbl, out)
    # P == -Q -> infinity (zero z; x/y values irrelevant)
    out = (out[0], out[1], ar.select(is_cancel, zero, out[2]))
    # infinity operands are not covered by the generic formulas
    out = sel3(jnp.logical_and(jnp.logical_not(p_inf), q_inf), p, out)
    out = sel3(p_inf, q, out)
    return out


def jac_add_affine(ar: Arith, p: Jac, xq, yq, q_valid) -> Jac:
    """Unified mixed add of an affine point (z=1 implied). q_valid is a batch
    bool masking out absent points (treated as infinity)."""
    x1, y1, z1 = p
    z1z1 = ar.sqr(z1)
    u2 = ar.mul(xq, z1z1)
    s2 = ar.mul(ar.mul(yq, z1), z1z1)
    h = ar.sub(u2, x1)
    r = ar.sub(s2, y1)
    hh = ar.sqr(h)
    hhh = ar.mul(h, hh)
    v = ar.mul(x1, hh)
    x3 = ar.sub(ar.sub(ar.sqr(r), hhh), ar.dbl(v))
    y3 = ar.sub(ar.mul(r, ar.sub(v, x3)), ar.mul(y1, hhh))
    z3 = ar.mul(z1, h)
    out = (x3, y3, z3)

    p_inf = ar.is_zero(z1)
    same_x = ar.is_zero(h)
    same_y = ar.is_zero(r)
    is_double = jnp.logical_and(same_x, same_y)
    is_cancel = jnp.logical_and(same_x, jnp.logical_not(same_y))

    dbl = jac_double(ar, p)
    zero = ar.zeros_like(z3)
    one = ar.one_like(z3)

    def sel3(cond, a3, b3):
        return tuple(ar.select(cond, ac, bc) for ac, bc in zip(a3, b3))

    out = sel3(is_double, dbl, out)
    out = (out[0], out[1], ar.select(is_cancel, zero, out[2]))
    out = sel3(p_inf, (xq, yq, one), out)
    out = sel3(jnp.logical_not(q_valid), p, out)
    return out


@dataclass(frozen=True)
class CurveOps:
    """Concrete curve ops bound to a base-field spec (Fp curves)."""

    field: FieldSpec

    def arith(self) -> Arith:
        return fp_arith(self.field)

    # ---- host <-> device ----

    def encode_affine(self, points) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """points: list of (x, y) ints or None -> (x, y, valid) device arrays
        in Montgomery form. Infinity entries get valid=False."""
        xs, ys, valid = [], [], []
        for pt in points:
            if pt is None:
                xs.append(0)
                ys.append(0)
                valid.append(False)
            else:
                xs.append(pt[0])
                ys.append(pt[1])
                valid.append(True)
        return (
            self.field.encode(xs),
            self.field.encode(ys),
            jnp.asarray(np.array(valid)),
        )

    def encode_jac(self, points) -> Jac:
        x, y, valid = self.encode_affine(points)
        one = jnp.broadcast_to(
            jnp.asarray(self.field.one_mont_limbs), x.shape
        )
        z = jnp.where(valid[..., None], one, jnp.zeros_like(x))
        return (x, y, z)

    def decode_jac(self, p: Jac):
        """Device Jacobian points -> list of affine int tuples (None = inf)."""
        x = np.atleast_1d(self.field.decode(p[0])).reshape(-1)
        y = np.atleast_1d(self.field.decode(p[1])).reshape(-1)
        z = np.atleast_1d(self.field.decode(p[2])).reshape(-1)
        out = []
        mod = self.field.modulus
        for xi, yi, zi in zip(x, y, z):
            xi, yi, zi = int(xi), int(yi), int(zi)
            if zi == 0:
                out.append(None)
                continue
            zinv = pow(zi, -1, mod)
            zinv2 = zinv * zinv % mod
            out.append((xi * zinv2 % mod, yi * zinv2 % mod * zinv % mod))
        return out

    # ---- point ops (wrappers fixing the infinity-one constant) ----
    # On TPU backends these dispatch to the fused Pallas kernels (whole
    # point formula resident in VMEM, ~30x fewer HBM passes); the jnp
    # path is the CPU/test fallback and the bit-exact reference.

    def _use_pallas(self) -> bool:
        import os

        flag = os.environ.get("ZKPOA_PALLAS", "auto")
        if flag == "0":
            return False
        if flag == "1":
            return True
        return jax.default_backend() != "cpu"

    def double(self, p: Jac) -> Jac:
        if self._use_pallas():
            from . import pallas_field as PF

            return PF.jac_double_tpu(self.field, p)
        return jac_double(self.arith(), p)

    def add(self, p: Jac, q: Jac) -> Jac:
        if self._use_pallas():
            from . import pallas_field as PF

            return PF.jac_add_tpu(self.field, p, q)
        return jac_add(self.arith(), p, q)

    def add_affine(self, p: Jac, xq, yq, q_valid) -> Jac:
        if self._use_pallas():
            from . import pallas_field as PF

            return PF.jac_add_affine_tpu(self.field, p, xq, yq, q_valid)
        return jac_add_affine(self.arith(), p, xq, yq, q_valid)

    def infinity(self, batch_shape: Tuple[int, ...]) -> Jac:
        k = self.field.n_limbs
        shape = tuple(batch_shape) + (k,)
        z = jnp.zeros(shape, dtype=jnp.uint32)
        return (jnp.zeros_like(z), jnp.zeros_like(z), z)

    def scalar_mul_batch(self, p: Jac, scalars: jnp.ndarray, n_bits: int) -> Jac:
        return scalar_mul_batch(self, p, scalars, n_bits)


@partial(jax.jit, static_argnums=(0, 3))
def scalar_mul_batch(ops, p: Jac, scalars: jnp.ndarray, n_bits: int) -> Jac:
    """Batched double-and-add for any curve-ops object (Fp CurveOps or the
    Fp2 G2Ops): scalars as plain uint32 16-bit limb arrays [..., K_s],
    MSB-first over n_bits. fori_loop body keeps the compiled graph small."""
    batch_shape = jnp.broadcast_shapes(scalars.shape[:-1])
    acc = ops.infinity(batch_shape)

    def body(i, acc):
        bit = n_bits - 1 - i  # traced int32 scalar
        limb = bit // L.LIMB_BITS
        off = (bit % L.LIMB_BITS).astype(jnp.uint32)
        word = jnp.take_along_axis(
            scalars, jnp.broadcast_to(limb, scalars.shape[:-1])[..., None], axis=-1
        )[..., 0]
        bit_set = ((word >> off) & 1).astype(bool)
        acc = ops.double(acc)
        added = ops.add(acc, p)
        return jax.tree.map(
            lambda a, b: jnp.where(bit_set[..., None], a, b), added, acc
        )

    return jax.lax.fori_loop(0, n_bits, body, acc)


@partial(jax.jit, static_argnums=0)
def jac_to_affine_mont(spec: FieldSpec, p: Jac):
    """Batched Jacobian -> affine on device: one Fermat batch inverse of z
    (ops.limbs.mont_inv), then x/z^2, y/z^3. Returns (xs, ys, valid)
    Montgomery limb arrays + a bool mask (False = infinity). This is what
    lets multi-million-point zkey tables stay device-resident instead of
    round-tripping through per-point host decoding."""
    x, y, z = p
    valid = jnp.logical_not(L.is_zero(z))
    zinv = L.mont_inv(spec, z)
    zinv2 = L.mont_mul(spec, zinv, zinv)
    xs = L.mont_mul(spec, x, zinv2)
    ys = L.mont_mul(spec, y, L.mont_mul(spec, zinv2, zinv))
    return xs, ys, valid


def _host_mul(curve_host_add, pt, k):
    acc = None
    while k:
        if k & 1:
            acc = curve_host_add(acc, pt)
        pt = curve_host_add(pt, pt)
        k >>= 1
    return acc


_FB_TABLE_CACHE = {}


def fixed_base_table(curve_name: str, base, host_add, n_bits: int, w: int):
    """Windowed fixed-base table: table[j][e] = (e << (w*j)) * base affine,
    cached per (curve, base, w) in-process and on disk. Entry 0 is a dummy
    (masked out by valid=False at gather time)."""
    import os

    key = (curve_name, str(base), n_bits, w)
    if key in _FB_TABLE_CACHE:
        return _FB_TABLE_CACHE[key]
    nwin = (n_bits + w - 1) // w
    cache_dir = os.path.join(os.path.dirname(__file__), "_cache")
    os.makedirs(cache_dir, exist_ok=True)
    import hashlib

    digest = hashlib.sha256(repr(key).encode()).hexdigest()[:16]
    path = os.path.join(cache_dir, f"fbtab_{curve_name}_{digest}.npy")
    if os.path.exists(path):
        table = np.load(path, allow_pickle=True)
    else:
        table = np.empty((nwin, 1 << w), dtype=object)
        row_base = base
        for j in range(nwin):
            acc = None
            table[j][0] = None
            for e in range(1, 1 << w):
                acc = host_add(acc, row_base)
                table[j][e] = acc
            for _ in range(w):
                row_base = host_add(row_base, row_base)
        np.save(path, table, allow_pickle=True)
    _FB_TABLE_CACHE[key] = table
    return table


def fixed_base_mul_batch(
    ops, curve_name: str, base, host_add, scalars: jnp.ndarray, n_bits: int, w: int = 8
):
    """Batched fixed-base scalar mult via windowed table gathers: nwin
    mixed additions instead of n_bits double-and-adds (~16x less work, and
    each step is a big batched op). scalars: [N, K_s] plain 16-bit limbs."""
    assert w in (4, 8, 16) and L.LIMB_BITS % w == 0
    table = fixed_base_table(curve_name, base, host_add, n_bits, w)
    nwin = table.shape[0]
    # encode table coords once (device-resident constants), rows [nwin, 2^w, ...]
    flat = [pt for row in table for pt in row]
    xs_t, ys_t, valid_t = ops.encode_affine(flat)
    xs_t = jax.tree.map(lambda a: a.reshape((nwin, 1 << w) + a.shape[1:]), xs_t)
    ys_t = jax.tree.map(lambda a: a.reshape((nwin, 1 << w) + a.shape[1:]), ys_t)
    valid_t = valid_t.reshape(nwin, 1 << w)
    return _fb_fold(ops, xs_t, ys_t, valid_t, scalars, n_bits, w)


def fixed_base_mul_batch_pallas(
    ops, curve_name: str, base, host_add, scalars: jnp.ndarray,
    n_bits: int, w: int = 8
):
    """EXPERIMENTAL — NOT wired into setup: fixed_base_mul_batch through
    the MSM Pallas accumulation kernel. On the axon TPU backend this
    MISCOMPILES for a lane-periodic subset (lanes with lane%128 < 16
    produced wrong sums; a direct _accum_group call on the same streams
    returned garbage exception rows) while the identical kernel is exact
    in the MSM paths — under investigation; the CPU route falls through
    to the correct jnp fold, and prover setup uses fixed_base_mul_batch."""
    from . import msm_pallas as M2

    table = fixed_base_table(curve_name, base, host_add, n_bits, w)
    nwin = table.shape[0]
    flat = [pt for row in table for pt in row]
    xs_t, ys_t, valid_t = ops.encode_affine(flat)  # [nwin*2^w, K]
    n = scalars.shape[0]
    if (
        jax.default_backend() == "cpu"
        or n % M2.LANE_TILE != 0
        or not isinstance(xs_t, jnp.ndarray)
    ):
        xs_r = jax.tree.map(lambda a: a.reshape((nwin, 1 << w) + a.shape[1:]), xs_t)
        ys_r = jax.tree.map(lambda a: a.reshape((nwin, 1 << w) + a.shape[1:]), ys_t)
        return _fb_fold(ops, xs_r, ys_r, valid_t.reshape(nwin, 1 << w),
                        scalars, n_bits, w)
    acc, exc = _fb_fold_pallas(ops, xs_t, ys_t, valid_t,
                               jnp.asarray(scalars), n_bits, w)
    if int(exc) != 0:
        xs_r = jax.tree.map(lambda a: a.reshape((nwin, 1 << w) + a.shape[1:]), xs_t)
        ys_r = jax.tree.map(lambda a: a.reshape((nwin, 1 << w) + a.shape[1:]), ys_t)
        return _fb_fold(ops, xs_r, ys_r, valid_t.reshape(nwin, 1 << w),
                        scalars, n_bits, w)
    return acc


@partial(jax.jit, static_argnums=(0, 5, 6))
def _fb_fold_pallas(ops, xs_flat, ys_flat, valid_flat, scalars,
                    n_bits: int, w: int):
    """Window fold on the Pallas mixed-add kernel: digits -> flat table
    indices, one gathered [nwin, K, N] stream consumed by a (ntiles, nwin)
    kernel grid with the per-lane accumulator VMEM-resident."""
    from . import msm_pallas as M2

    nwin = (n_bits + w - 1) // w
    n = scalars.shape[0]
    per_limb = L.LIMB_BITS // w
    digs = []
    for j in range(nwin):
        limb = j // per_limb
        sh = (j % per_limb) * w
        digs.append(((scalars[:, limb] >> sh) & jnp.uint32((1 << w) - 1))
                    .astype(jnp.int32) + jnp.int32(j << w))
    idx = jnp.stack(digs, axis=0)  # [nwin, N] flat table indices
    px = jnp.transpose(xs_flat[idx], (0, 2, 1))  # [nwin, K, N]
    py = jnp.transpose(ys_flat[idx], (0, 2, 1))
    v = valid_flat[idx].astype(jnp.uint32)  # [nwin, N]
    # round the round axis up to a multiple of 8 (the kernel's valid-mask
    # sublane block)
    pad = (-nwin) % 8
    if pad:
        px = jnp.concatenate([px, jnp.zeros((pad,) + px.shape[1:], px.dtype)])
        py = jnp.concatenate([py, jnp.zeros((pad,) + py.shape[1:], py.dtype)])
        v = jnp.concatenate([v, jnp.zeros((pad, n), v.dtype)])
    geo = M2.MsmPlan(254, 11, n, nwin + pad)  # shapes only
    k = xs_flat.shape[1]
    ax = jnp.zeros((k, n), jnp.uint32)
    ay = jnp.zeros((k, n), jnp.uint32)
    az = jnp.zeros((k, n), jnp.uint32)
    ae = jnp.zeros((8, n), jnp.uint32)
    ax, ay, az, ae = M2._accum_group(ops, geo, ax, ay, az, ae, px, py, v)
    return (ax.T, ay.T, az.T), jnp.sum(ae[0])


@partial(jax.jit, static_argnums=(0, 5, 6))
def _fb_fold(ops, xs_t, ys_t, valid_t, scalars, n_bits: int, w: int):
    nwin = (n_bits + w - 1) // w
    n = scalars.shape[0]
    per_limb = L.LIMB_BITS // w
    digs = []
    for j in range(nwin):
        limb = j // per_limb
        sh = (j % per_limb) * w
        digs.append((scalars[:, limb] >> sh) & jnp.uint32((1 << w) - 1))
    digits = jnp.stack(digs, axis=0)  # [nwin, N]

    acc0 = ops.infinity((n,))

    def step(acc, xs):
        dig, xt, yt, vt = xs
        idx = dig.astype(jnp.int32)
        xg = jax.tree.map(lambda a: a[idx], xt)
        yg = jax.tree.map(lambda a: a[idx], yt)
        vg = vt[idx]
        return ops.add_affine(acc, xg, yg, vg), None

    acc, _ = jax.lax.scan(step, acc0, (digits, xs_t, ys_t, valid_t))
    return acc


BN254_G1 = CurveOps(L.BN254_FQ)
SECP256K1 = CurveOps(L.SECP256K1_FQ)
