"""Radix-2 NTT over the BN254 scalar field on TPU.

Used by the Groth16 prover for the QAP quotient h(X) = (A·B - C)/Z: three
inverse NTTs (evals -> coeffs), coset-shifted forward NTTs, pointwise ops,
and a final inverse NTT — the role rapidsnark's iFFT/FFT plays on CPU
(SURVEY.md §2.5). Fr has 2-adicity 28 (r - 1 = 2^28 · odd) with multiplicative
generator 5, so domains up to 2^28 are supported — enough for the reference's
largest circuits (48M constraints -> 2^26 domain).

Layout: values are Montgomery limb arrays [n, K]; each butterfly stage is a
reshape + one batched mont_mul + add/sub pair, so the full transform is
log2(n) fused elementwise passes. Twiddle tables are precomputed per domain
(host, cached) and streamed per stage.

Multi-host plan (parallel.mesh): split the first log2(n_dev) stages across
devices with all_to_all between the "global" and "local" halves of the
transform (standard distributed-FFT transpose or "four-step" decomposition).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bn254 import FR_GENERATOR, R, TWO_ADICITY
from . import limbs as L
from .limbs import BN254_FR


def domain_root(log_n: int) -> int:
    """Primitive 2^log_n-th root of unity in Fr."""
    if log_n > TWO_ADICITY:
        raise ValueError(f"domain 2^{log_n} exceeds 2-adicity {TWO_ADICITY}")
    return pow(FR_GENERATOR, (R - 1) >> log_n, R)


def host_mont_limbs(vals) -> np.ndarray:
    """Montgomery-encode values on the HOST (no device work — safe inside
    traced/jitted contexts where table caches may first be populated)."""
    r_shift = 1 << (BN254_FR.n_limbs * 16)
    return np.asarray(BN254_FR.to_limbs([int(v) * r_shift % R for v in vals]))


@lru_cache(maxsize=None)
def _domain_tables(log_n: int, inverse: bool) -> Tuple[Tuple[np.ndarray, ...], np.ndarray]:
    """Per-stage twiddle tables (Montgomery limbs) + bit-reversal permutation."""
    n = 1 << log_n
    w = domain_root(log_n)
    if inverse:
        w = pow(w, -1, R)
    # bit reversal permutation
    rev = np.zeros(n, dtype=np.int32)
    for i in range(n):
        rev[i] = int(format(i, f"0{log_n}b")[::-1], 2) if log_n else 0
    stages: List[np.ndarray] = []
    for s in range(log_n):
        half = 1 << s
        base = pow(w, n >> (s + 1), R)
        tw = [1] * half
        for j in range(1, half):
            tw[j] = tw[j - 1] * base % R
        stages.append(host_mont_limbs(tw))
    return tuple(stages), rev


@partial(jax.jit, static_argnums=(1, 2))
def _ntt_impl(values: jnp.ndarray, log_n: int, inverse: bool, stages, rev) -> jnp.ndarray:
    """Transform over axis -2 ([..., n, K]); leading dims are batch (used
    by the distributed four-step NTT for its row/column sub-transforms)."""
    spec = BN254_FR
    n = 1 << log_n
    lead = values.shape[:-2]
    x = jnp.take(values, rev, axis=-2)
    for s in range(log_n):
        half = 1 << s
        tw = stages[s]  # [half, K]
        xb = x.reshape(lead + (n // (2 * half), 2, half, spec.n_limbs))
        u = xb[..., 0, :, :]
        v = L.mont_mul(spec, xb[..., 1, :, :], tw)
        lo = L.add_mod(spec, u, v)
        hi = L.sub_mod(spec, u, v)
        x = jnp.stack([lo, hi], axis=-3).reshape(lead + (n, spec.n_limbs))
    if inverse:
        n_inv = pow(n, -1, R)
        n_inv_m = spec.encode([n_inv])[0]
        x = L.mont_mul(spec, x, n_inv_m)
    return x


def ntt(values_mont: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """values_mont: [..., n, K] Montgomery limbs, n a power of two; the
    transform runs over axis -2, leading dims are batch."""
    n = values_mont.shape[-2]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "size must be a power of two"
    stages, rev = _domain_tables(log_n, inverse)
    return _ntt_impl(
        values_mont,
        log_n,
        inverse,
        tuple(jnp.asarray(s) for s in stages),
        jnp.asarray(rev),
    )


def snarkjs_coset_shift(log_n: int) -> int:
    """The coset shift snarkjs/rapidsnark use for the h-query path of a
    2^log_n domain: zkey section 9 is built from the ODD Lagrange points of
    the 2n ptau domain (snarkjs zkey_new.js), i.e. the coset nodes are
    w_{2n}^{2i+1} = w_{2n} * w_n^i — the shift is the primitive 2n-th root
    of unity (groth16_prove.js shifts by Fr.w[power+1], rapidsnark by
    fft->root(domainPower+1, 1)). Note shift^n = -1, so Z on the coset is
    the constant -2. (ffjavascript's Fr.shift = nqr^2 = 25 is only the
    degenerate power == Fr.s fallback, never hit for real circuits.)"""
    return domain_root(log_n + 1)


@lru_cache(maxsize=None)
def _coset_tables(log_n: int, inverse: bool, shift: int = FR_GENERATOR) -> np.ndarray:
    """Powers g^i (or g^-i) of the coset shift g, Montgomery encoded."""
    n = 1 << log_n
    g = shift if not inverse else pow(shift, -1, R)
    pw = [1] * n
    for i in range(1, n):
        pw[i] = pw[i - 1] * g % R
    return host_mont_limbs(pw)


def coset_shift(
    values_mont: jnp.ndarray, inverse: bool = False, shift: int = FR_GENERATOR
) -> jnp.ndarray:
    """Multiply coefficient i by g^(±i): maps polynomial evaluation domain
    D -> gD (the coset where Z(x) = x^n - 1 is the nonzero constant g^n - 1).
    Operates on axis -2 ([..., n, K]); leading dims are batch."""
    n = values_mont.shape[-2]
    log_n = n.bit_length() - 1
    tbl = jnp.asarray(_coset_tables(log_n, inverse, shift))
    return L.mont_mul(BN254_FR, values_mont, tbl)


def coset_qap_evals(
    a_ev: jnp.ndarray,
    b_ev: jnp.ndarray,
    c_ev: jnp.ndarray,
    shift: int = None,
) -> jnp.ndarray:
    """(A·B − C) evaluated over the shifted coset g·D — the h-MSM operand
    for zkeys whose section-9 basis is snarkjs' coset-Lagrange convention.

    snarkjs/rapidsnark never form h(X)'s coefficients: they evaluate
    P = A·B − C on the coset g·D (g = w_{2n}, where Z is the nonzero
    constant g^n − 1 = −2) and MSM those evaluations directly against
    section-9 points H_i = L_i^{coset}(τ)·Z(τ)/((g^n−1)·δ)·G1. Inputs/
    outputs are Montgomery limbs [n, K]; the constant-Z division lives in
    the H points, not here.
    """
    if shift is None:
        shift = snarkjs_coset_shift(a_ev.shape[-2].bit_length() - 1)
    a_c = ntt(a_ev, inverse=True)
    b_c = ntt(b_ev, inverse=True)
    c_c = ntt(c_ev, inverse=True)
    a_s = ntt(coset_shift(a_c, shift=shift), inverse=False)
    b_s = ntt(coset_shift(b_c, shift=shift), inverse=False)
    c_s = ntt(coset_shift(c_c, shift=shift), inverse=False)
    ab = L.mont_mul(BN254_FR, a_s, b_s)
    return L.sub_mod(BN254_FR, ab, c_s)


def quotient(a_ev: jnp.ndarray, b_ev: jnp.ndarray, c_ev: jnp.ndarray) -> jnp.ndarray:
    """Compute h(X) coefficients with (A·B - C) exactly divisible by
    Z(X) = X^n - 1 on the evaluation domain (the Groth16/QAP setting).

    Inputs are evaluations over the size-n domain (Montgomery limbs
    [..., n, K]; leading dims batch over independent proofs).
    Returns h coefficients [..., n, K] (degree <= n-2; top coefficient zero).
    """
    spec = BN254_FR
    n = a_ev.shape[-2]
    # to coefficients
    a_c = ntt(a_ev, inverse=True)
    b_c = ntt(b_ev, inverse=True)
    c_c = ntt(c_ev, inverse=True)
    # to coset evaluations
    a_s = ntt(coset_shift(a_c), inverse=False)
    b_s = ntt(coset_shift(b_c), inverse=False)
    c_s = ntt(coset_shift(c_c), inverse=False)
    # pointwise (A·B - C) / Z(coset), Z constant = g^n - 1
    ab = L.mont_mul(spec, a_s, b_s)
    num = L.sub_mod(spec, ab, c_s)
    zinv = pow((pow(FR_GENERATOR, n, R) - 1) % R, -1, R)
    zinv_m = spec.encode([zinv])[0]
    h_s = L.mont_mul(spec, num, zinv_m[None, :])
    # back to coefficients, unshift
    h_c = ntt(h_s, inverse=True)
    return coset_shift(h_c, inverse=True)
