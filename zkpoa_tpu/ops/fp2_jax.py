"""Batched Fp2 arithmetic for BN254 G2 on TPU.

Fp2 = Fp[u]/(u^2+1); an element is a (c0, c1) tuple of limb arrays, so all
ops vectorize exactly like Fp. Karatsuba multiplication costs 3 mont_muls.
Together with the generic Jacobian formulas in curve_jax (Arith vtable),
this gives branchless batched G2 point ops — needed for the pi_B G2 MSM of
the Groth16 prover (rapidsnark's G2 MSM on CPU, SURVEY.md §2.5).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..fields import bn254
from . import limbs as L
from .curve_jax import Arith, Jac, jac_add, jac_add_affine, jac_double
from .limbs import BN254_FQ, FieldSpec

Fp2 = Tuple[jnp.ndarray, jnp.ndarray]


def fp2_add(a: Fp2, b: Fp2) -> Fp2:
    return (L.add_mod(BN254_FQ, a[0], b[0]), L.add_mod(BN254_FQ, a[1], b[1]))


def fp2_sub(a: Fp2, b: Fp2) -> Fp2:
    return (L.sub_mod(BN254_FQ, a[0], b[0]), L.sub_mod(BN254_FQ, a[1], b[1]))


def fp2_dbl(a: Fp2) -> Fp2:
    return (L.add_mod(BN254_FQ, a[0], a[0]), L.add_mod(BN254_FQ, a[1], a[1]))


def fp2_mul(a: Fp2, b: Fp2) -> Fp2:
    s = BN254_FQ
    t0 = L.mont_mul(s, a[0], b[0])
    t1 = L.mont_mul(s, a[1], b[1])
    t2 = L.mont_mul(s, L.add_mod(s, a[0], a[1]), L.add_mod(s, b[0], b[1]))
    c0 = L.sub_mod(s, t0, t1)
    c1 = L.sub_mod(s, L.sub_mod(s, t2, t0), t1)
    return (c0, c1)


def fp2_sqr(a: Fp2) -> Fp2:
    s = BN254_FQ
    # (a0+a1)(a0-a1), 2*a0*a1
    c0 = L.mont_mul(s, L.add_mod(s, a[0], a[1]), L.sub_mod(s, a[0], a[1]))
    t = L.mont_mul(s, a[0], a[1])
    return (c0, L.add_mod(s, t, t))


def fp2_is_zero(a: Fp2) -> jnp.ndarray:
    return jnp.logical_and(L.is_zero(a[0]), L.is_zero(a[1]))


def fp2_select(cond: jnp.ndarray, a: Fp2, b: Fp2) -> Fp2:
    return (L.select(cond, a[0], b[0]), L.select(cond, a[1], b[1]))


def fp2_zeros_like(a: Fp2) -> Fp2:
    return (jnp.zeros_like(a[0]), jnp.zeros_like(a[1]))


def fp2_one_like(a: Fp2) -> Fp2:
    one = jnp.broadcast_to(jnp.asarray(BN254_FQ.one_mont_limbs), a[0].shape)
    return (one, jnp.zeros_like(a[1]))


def fp2_inv(a: Fp2) -> Fp2:
    """Batched Fp2 inverse: 1/(c0 + c1 u) = (c0 - c1 u)/(c0^2 + c1^2)
    (u^2 = -1), with one Fp Fermat batch inverse for the norm."""
    s = BN254_FQ
    norm = L.add_mod(s, L.mont_mul(s, a[0], a[0]), L.mont_mul(s, a[1], a[1]))
    ninv = L.mont_inv(s, norm)
    zero = jnp.zeros_like(a[1])
    return (L.mont_mul(s, a[0], ninv), L.mont_mul(s, L.sub_mod(s, zero, a[1]), ninv))


def g2_jac_to_affine_mont(p):
    """Batched G2 Jacobian -> affine (Fp2 coords): (xs, ys, valid)."""
    x, y, z = p
    valid = jnp.logical_not(fp2_is_zero(z))
    zinv = fp2_inv(z)
    zinv2 = fp2_mul(zinv, zinv)
    xs = fp2_mul(x, zinv2)
    ys = fp2_mul(y, fp2_mul(zinv2, zinv))
    return xs, ys, valid


def fp2_arith() -> Arith:
    return Arith(
        add=fp2_add,
        sub=fp2_sub,
        mul=fp2_mul,
        sqr=fp2_sqr,
        dbl=fp2_dbl,
        is_zero=fp2_is_zero,
        select=fp2_select,
        zeros_like=fp2_zeros_like,
        one_like=fp2_one_like,
    )


@dataclass(frozen=True)
class G2Ops:
    """BN254 G2 (on the twist over Fp2) batched curve ops, mirroring
    curve_jax.CurveOps. Points: ((x0,x1),(y0,y1),(z0,z1)) limb-array tuples."""

    field: FieldSpec = BN254_FQ

    def arith(self) -> Arith:
        return fp2_arith()

    def encode_affine(self, points):
        """points: list of ((x0,x1),(y0,y1)) int-pair tuples or None."""
        x0, x1, y0, y1, valid = [], [], [], [], []
        for pt in points:
            if pt is None:
                x0.append(0); x1.append(0); y0.append(0); y1.append(0)
                valid.append(False)
            else:
                (a, b), (c, d) = pt
                x0.append(a); x1.append(b); y0.append(c); y1.append(d)
                valid.append(True)
        enc = self.field.encode
        return (
            (enc(x0), enc(x1)),
            (enc(y0), enc(y1)),
            jnp.asarray(np.array(valid)),
        )

    def encode_jac(self, points) -> Jac:
        x, y, valid = self.encode_affine(points)
        one = jnp.broadcast_to(jnp.asarray(self.field.one_mont_limbs), x[0].shape)
        zero = jnp.zeros_like(x[0])
        z = (jnp.where(valid[..., None], one, zero), zero)
        return (x, y, z)

    def decode_jac(self, p: Jac):
        dec = self.field.decode
        comps = [np.atleast_1d(dec(c)).reshape(-1) for coord in p for c in coord]
        x0, x1, y0, y1, z0, z1 = comps
        out = []
        mod = self.field.modulus
        for i in range(len(x0)):
            z = (int(z0[i]), int(z1[i]))
            if z == (0, 0):
                out.append(None)
                continue
            zinv = bn254.fp2_inv(z)
            zinv2 = bn254.fp2_mul(zinv, zinv)
            zinv3 = bn254.fp2_mul(zinv2, zinv)
            x = bn254.fp2_mul((int(x0[i]), int(x1[i])), zinv2)
            y = bn254.fp2_mul((int(y0[i]), int(y1[i])), zinv3)
            out.append((x, y))
        return out

    def double(self, p: Jac) -> Jac:
        return jac_double(self.arith(), p)

    def add(self, p: Jac, q: Jac) -> Jac:
        return jac_add(self.arith(), p, q)

    def add_affine(self, p: Jac, xq, yq, q_valid) -> Jac:
        return jac_add_affine(self.arith(), p, xq, yq, q_valid)

    def infinity(self, batch_shape):
        k = self.field.n_limbs
        shape = tuple(batch_shape) + (k,)
        z = jnp.zeros(shape, dtype=jnp.uint32)
        pair = lambda: (jnp.zeros_like(z), jnp.zeros_like(z))  # noqa: E731
        return (pair(), pair(), (jnp.zeros_like(z), jnp.zeros_like(z)))


BN254_G2 = G2Ops()
