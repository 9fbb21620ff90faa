"""Vectorized exact multi-limb modular arithmetic for TPU (JAX).

This is the compute substrate of the whole framework: every hot kernel
(Poseidon hashing, Pippenger MSM point arithmetic, NTT butterflies, witness
generation) runs on this representation. The reference delegates the same
math to GMP/asm inside rapidsnark and the circom C++ witness generators
(SURVEY.md §2.5); here it is data-parallel integer arithmetic that XLA/Pallas
can tile over the VPU, with a host numpy path for conversions.

Representation
--------------
A field element is 16-bit little-endian limbs stored as uint32:
``x = sum_j limbs[..., j] << (16*j)``, normalized limbs < 2^16. 254-256-bit
fields use K=16 limbs. All ops are elementwise over arbitrary leading batch
dims; the limb axis is last (size K, padded into lanes by XLA).

Why 16-bit limbs in uint32: products of normalized limbs are exact in
uint32 (no widening needed — TPUs have no 64-bit int multiply), and
deferred-carry accumulation of ≤ 2^6 partial products stays « 2^32.

Multiplication is CIOS Montgomery with deferred carries: R = 2^(16K),
elements in Montgomery form x̃ = x·R mod p. The low 16 bits of an
unnormalized accumulator limb 0 are exact (higher excess carries belong to
higher limbs), which is what makes the deferred-carry m-computation valid.

Exactness contract: integers only — no floats anywhere near proof data
(SURVEY.md §7 "Hard parts").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def _int_to_limbs_py(x: int, k: int) -> list:
    out = []
    for _ in range(k):
        out.append(x & LIMB_MASK)
        x >>= LIMB_BITS
    assert x == 0, "value does not fit"
    return out


@dataclass(frozen=True)
class FieldSpec:
    """Precomputed per-modulus data for limb arithmetic."""

    modulus: int
    n_limbs: int = 16
    name: str = ""

    # derived, filled in __post_init__
    mod_limbs: np.ndarray = field(init=False, repr=False, compare=False)
    n0inv: int = field(init=False, repr=False, compare=False)
    r_mod: int = field(init=False, repr=False, compare=False)
    r2_limbs: np.ndarray = field(init=False, repr=False, compare=False)
    one_mont_limbs: np.ndarray = field(init=False, repr=False, compare=False)

    def __post_init__(self):
        k = self.n_limbs
        assert self.modulus % 2 == 1
        assert self.modulus < (1 << (LIMB_BITS * k))
        object.__setattr__(
            self, "mod_limbs", np.array(_int_to_limbs_py(self.modulus, k), dtype=np.uint32)
        )
        object.__setattr__(
            self, "n0inv", (-pow(self.modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        )
        r = pow(2, LIMB_BITS * k, self.modulus)
        object.__setattr__(self, "r_mod", r)
        r2 = r * r % self.modulus
        object.__setattr__(self, "r2_limbs", np.array(_int_to_limbs_py(r2, k), dtype=np.uint32))
        object.__setattr__(
            self, "one_mont_limbs", np.array(_int_to_limbs_py(r, k), dtype=np.uint32)
        )

    # ---- host conversions (numpy, exact) ----

    def to_limbs(self, values) -> np.ndarray:
        """Python ints (nested lists ok) -> uint32 limb array [..., K]."""
        arr = np.asarray(values, dtype=object)
        out = np.empty(arr.shape + (self.n_limbs,), dtype=np.uint32)
        flat = arr.reshape(-1)
        oflat = out.reshape(-1, self.n_limbs)
        for i, v in enumerate(flat):
            oflat[i] = _int_to_limbs_py(int(v) % self.modulus, self.n_limbs)
        return out

    def from_limbs(self, limbs) -> np.ndarray:
        """uint32 limb array [..., K] -> object array of Python ints."""
        limbs = np.asarray(limbs)
        flat = limbs.reshape(-1, self.n_limbs)
        out = np.empty(flat.shape[0], dtype=object)
        for i, row in enumerate(flat):
            x = 0
            for limb in row[::-1]:
                x = (x << LIMB_BITS) | int(limb)
            out[i] = x
        return out.reshape(limbs.shape[:-1])

    def to_mont(self, x):
        return mont_mul(self, x, jnp.asarray(self.r2_limbs))

    def from_mont(self, x):
        one = jnp.zeros_like(x).at[..., 0].set(1)
        return mont_mul(self, x, one)

    def encode(self, values) -> jnp.ndarray:
        """ints -> Montgomery limb form on device."""
        return self.to_mont(jnp.asarray(self.to_limbs(values)))

    def decode(self, limbs) -> np.ndarray:
        """Montgomery limb form -> python ints."""
        return self.from_limbs(np.asarray(self.from_mont(limbs)))


# ---------------------------------------------------------------------------
# Core limb kernels (pure jnp; shapes [..., K]; dtype uint32)
# ---------------------------------------------------------------------------


def _carry_normalize(t: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Propagate carries so limbs < 2^16. Returns (limbs[..., :k], overflow).

    Sequential over the limb axis as a lax.scan (one tiny body instead of an
    unrolled chain — XLA:CPU chokes compiling the unrolled form inlined into
    large kernels; the scan compiles in milliseconds and vectorizes over the
    batch)."""
    tt = jnp.moveaxis(t, -1, 0)  # [L, ...]

    def step(carry, limb):
        v = limb + carry
        return v >> LIMB_BITS, v & LIMB_MASK

    carry, norm = jax.lax.scan(step, jnp.zeros_like(tt[0]), tt)
    norm = jnp.moveaxis(norm, 0, -1)
    limbs = norm[..., :k]
    extra = carry
    for j in range(k, t.shape[-1]):
        extra = extra + norm[..., j]  # remaining normalized high limbs
    return limbs, extra


def _sub_p_with_borrow(a: jnp.ndarray, mod_limbs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """a - p limbwise with borrow chain (scan); returns (diff, final_borrow)."""
    aa = jnp.moveaxis(a, -1, 0)  # [K, ...]

    def step(borrow, xs):
        limb, p_limb = xs
        v = limb + (LIMB_MASK + 1) - p_limb - borrow
        return 1 - (v >> LIMB_BITS), v & LIMB_MASK

    mods = jnp.broadcast_to(
        mod_limbs.reshape((-1,) + (1,) * (aa.ndim - 1)), aa.shape
    )
    borrow, diff = jax.lax.scan(step, jnp.zeros_like(aa[0]), (aa, mods))
    return jnp.moveaxis(diff, 0, -1), borrow


def _cond_sub_p(a: jnp.ndarray, overflow: jnp.ndarray, mod_limbs: jnp.ndarray) -> jnp.ndarray:
    """Given value = a + overflow*2^(16K) < 2p, reduce to < p."""
    diff, borrow = _sub_p_with_borrow(a, mod_limbs)
    use_diff = jnp.logical_or(overflow > 0, borrow == 0)
    return jnp.where(use_diff[..., None], diff, a)


@partial(jax.jit, static_argnums=0)
def add_mod(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    k = spec.n_limbs
    t = a + b
    limbs, extra = _carry_normalize(t, k)
    return _cond_sub_p(limbs, extra, jnp.asarray(spec.mod_limbs))


@partial(jax.jit, static_argnums=0)
def sub_mod(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p via a + p - b (a, b normalized < p)."""
    k = spec.n_limbs
    mod_l = jnp.asarray(spec.mod_limbs)
    limbs, extra = _carry_normalize(a + mod_l, k)  # value in [p, 2p)
    ll = jnp.moveaxis(limbs, -1, 0)
    bb = jnp.moveaxis(b, -1, 0)

    def step(borrow, xs):
        l_limb, b_limb = xs
        v = l_limb + (LIMB_MASK + 1) - b_limb - borrow
        return 1 - (v >> LIMB_BITS), v & LIMB_MASK

    borrow, res = jax.lax.scan(step, jnp.zeros_like(ll[0]), (ll, bb))
    res = jnp.moveaxis(res, 0, -1)
    overflow = extra - borrow  # value = res + overflow*2^(16K), in [0, 2p)
    return _cond_sub_p(res, overflow, mod_l)


def neg_mod(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    zero = jnp.zeros_like(a)
    return sub_mod(spec, zero, a)


@partial(jax.jit, static_argnums=0)
def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """CIOS Montgomery product with deferred carries: a*b*R^-1 mod p.

    Outer CIOS loop runs as a lax.scan over b's limbs (keeps the compiled
    graph ~K times smaller than unrolling; the body is batch-wide vector
    work). Deferred-carry invariant: accumulator limbs stay < 2^22 « 2^32,
    and limb 0's low 16 bits are always the true low bits, which makes the
    m = t0 * (-p^-1) computation valid without normalization."""
    k = spec.n_limbs
    mod_l = jnp.asarray(spec.mod_limbs)  # [K]
    n0inv = jnp.uint32(spec.n0inv)
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    bt = jnp.moveaxis(b, -1, 0)[..., None]  # [K, ..., 1]
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    t0 = jnp.zeros(batch + (k + 1,), dtype=jnp.uint32)

    def step(t, bi):
        prod = a * bi  # exact: (2^16-1)^2 < 2^32
        t = t.at[..., :k].add(prod & LIMB_MASK)
        t = t.at[..., 1 : k + 1].add(prod >> LIMB_BITS)
        m = ((t[..., 0] & LIMB_MASK) * n0inv) & LIMB_MASK
        q = mod_l * m[..., None]
        t = t.at[..., :k].add(q & LIMB_MASK)
        t = t.at[..., 1 : k + 1].add(q >> LIMB_BITS)
        carry = t[..., 0] >> LIMB_BITS
        t = jnp.concatenate([t[..., 1:], jnp.zeros_like(t[..., :1])], axis=-1)
        t = t.at[..., 0].add(carry)
        return t, None

    t, _ = jax.lax.scan(step, t0, bt)
    limbs, extra = _carry_normalize(t, k)
    return _cond_sub_p(limbs, extra, mod_l)


def mont_sqr(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, a)


@partial(jax.jit, static_argnums=0)
def mont_inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Batched modular inverse by Fermat (a^(p-2)), ~2 muls per exponent
    bit on the whole batch. a == 0 maps to 0 (callers mask separately)."""
    e = spec.modulus - 2
    nbits = e.bit_length()
    bits = jnp.asarray(
        [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.uint32
    )
    one = jnp.broadcast_to(jnp.asarray(spec.one_mont_limbs), a.shape)

    def body(i, acc):
        acc = mont_mul(spec, acc, acc)
        mul = mont_mul(spec, acc, a)
        return jnp.where(bits[i][None] != 0, mul, acc)

    return jax.lax.fori_loop(0, nbits, body, one)


def mont_pow5(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    a2 = mont_mul(spec, a, a)
    a4 = mont_mul(spec, a2, a2)
    return mont_mul(spec, a4, a)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """cond ? a : b, with cond shaped like the batch (no limb axis)."""
    return jnp.where(cond[..., None], a, b)


# ---------------------------------------------------------------------------
# Shared specs
# ---------------------------------------------------------------------------

from ..fields import bn254 as _bn254
from ..fields import curve25519 as _c25519
from ..fields import secp256k1 as _secp

BN254_FR = FieldSpec(_bn254.R, 16, "bn254_fr")
BN254_FQ = FieldSpec(_bn254.P, 16, "bn254_fq")
SECP256K1_FQ = FieldSpec(_secp.P, 16, "secp256k1_fq")
SECP256K1_FR = FieldSpec(_secp.N, 16, "secp256k1_fr")
ED25519_FQ = FieldSpec(_c25519.P, 16, "ed25519_fq")
