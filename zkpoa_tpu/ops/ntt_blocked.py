"""Blocked four-step NTT: QAP-quotient transforms at multi-million-point
domains within a fixed HBM budget.

Why this exists: the monolithic `ops.ntt.quotient` materializes per-stage
twiddle tables (~n·K·4 bytes per direction), a full n-point coset power
table, and six operand-sized intermediates at once — ~5GB at the layer-2
recursive domain (2^23), which RESOURCE_EXHAUSTED the chip twice on
hardware (round-2 VERDICT item 1). This module replaces it above
`BLOCKED_MIN_LOG_N` with the Bailey four-step decomposition n = A·B
(the same math as parallel/ntt_dist.py, but staged as sequential
fixed-shape block programs on ONE chip instead of an all_to_all across a
mesh):

    X[k1 + A·k2] = NTT_B over i2 ( w_n^{i2·k1} · NTT_A over i1 (x)[k1, i2] )

  * pass A processes column blocks [A, Bc, K]: an optional fused
    pre-multiply (Montgomery encode and/or coset shift — one broadcasted
    outer product of two small host power vectors), batched size-A NTTs,
    then the w_n^{i2·k1} twiddle built ON DEVICE from a [Bc, K] base row
    via a hi/lo power split (G + A/G small sequential muls + one outer
    product — ~3% of the block's butterfly work, no O(n) table anywhere).
  * pass B processes row blocks [Ar, B, K]: batched size-B NTTs plus an
    optional fused post-multiply indexed by the NATURAL output index
    k = k1 + A·k2 (outer product again) — this is where inverse-coset
    unshifts and from-Montgomery conversions fold in for free.
  * every block step is one jitted call with the operand DONATED and a
    traced block offset, so the [A, B, K] array is updated in place and
    each pass compiles exactly once; peak HBM = operand + one block
    working set. The Z[k1, k2] = X[k1 + A·k2] output layout is shared by
    all quotient operands, so pointwise stages never need a transpose;
    only the final h operand pays one.

Replaces rapidsnark's iFFT/FFT h(X) path (reference
scripts/g16_prove.sh:246-252, SURVEY.md §2.5) at recursion-scale domains.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bn254 import FR_GENERATOR, R
from . import limbs as L
from .limbs import BN254_FR
from .ntt import _domain_tables, _ntt_impl, domain_root, host_mont_limbs

BLOCKED_MIN_LOG_N = 18  # prover domains >= 2^18 route through this path
BLOCK_TARGET_BYTES = 128 << 20  # ~128MB block uploads / working sets


# ---------------------------------------------------------------------------
# Geometry + host power tables
# ---------------------------------------------------------------------------


def split_ab(log_n: int) -> Tuple[int, int]:
    """n = A·B with A = 2^(log_n//2) (square-ish; B = A or 2A)."""
    a = 1 << (log_n // 2)
    return a, (1 << log_n) // a


def _block_count(rows: int, row_bytes: int) -> int:
    """Blocks per pass: smallest power-of-two split keeping a block under
    BLOCK_TARGET_BYTES."""
    blocks = 1
    while rows // blocks > 1 and (rows // blocks) * row_bytes > BLOCK_TARGET_BYTES:
        blocks *= 2
    return blocks


@lru_cache(maxsize=None)
def _host_pows_mont(base: int, count: int, scale: int = 1) -> np.ndarray:
    """Montgomery limbs of [scale · base^i for i < count] (host, cached)."""
    pw = [scale % R] * count
    for i in range(1, count):
        pw[i] = pw[i - 1] * base % R
    return host_mont_limbs(pw)


def _split_g(a: int) -> int:
    """hi/lo split width for the on-device twiddle build: G ≈ sqrt(A)."""
    return 1 << ((a.bit_length()) // 2)


# ---------------------------------------------------------------------------
# On-device power-table construction
# ---------------------------------------------------------------------------


def _dev_pow_rows(base_row: jnp.ndarray, count: int) -> jnp.ndarray:
    """[count, Bc, K] with row i = base_row^i (Montgomery), via a scan of
    `count` batched muls (count ~ sqrt(A) — tiny vs the block's NTT work)."""
    spec = BN254_FR
    one = jnp.broadcast_to(jnp.asarray(spec.one_mont_limbs), base_row.shape)

    def step(acc, _):
        return L.mont_mul(spec, acc, base_row), acc

    _, rows = jax.lax.scan(step, one, None, length=count)
    return rows


def _dev_twiddle(base_row: jnp.ndarray, a: int) -> jnp.ndarray:
    """T[k1, j, K] = base_row[j]^k1 for k1 < a, built as an outer product
    of hi/lo power ladders (G + A/G sequential muls + one broadcast mul)."""
    spec = BN254_FR
    g = min(_split_g(a), a)
    lo = _dev_pow_rows(base_row, g)  # [G, Bc, K]
    if a // g > 1:
        base_g = L.mont_mul(spec, lo[g - 1], base_row)  # base^G
        hi = _dev_pow_rows(base_g, a // g)  # [A/G, Bc, K]
        t = L.mont_mul(spec, hi[:, None], lo[None, :])  # [A/G, G, Bc, K]
    else:
        t = lo[None]
    return t.reshape(a, base_row.shape[0], spec.n_limbs)


# ---------------------------------------------------------------------------
# Block passes (donated in-place updates on the [A, B, K] operand)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(2, 3, 4), donate_argnums=(0,))
def _pass_a_block(x_mat, j0, bc: int, inverse: bool, pre_on: bool,
                  stages, rev, tw_base_blk, pre_rows, pre_cols_blk):
    """One column block of pass A on x_mat [A, B, K]: columns [j0, j0+bc).

    pre (when pre_on): block multiply by mont_mul(pre_rows[i1],
    pre_cols_blk[i2]) — the caller arranges the power/scale contents so a
    plain block enters Montgomery form carrying the coset shift s^j.
    tw_base_blk [bc, K] = w_n^(±j2)·R for this block's columns."""
    spec = BN254_FR
    a = x_mat.shape[0]
    blk = jax.lax.dynamic_slice(x_mat, (0, j0, 0), (a, bc, spec.n_limbs))
    if pre_on:
        pre = L.mont_mul(spec, pre_rows[:, None], pre_cols_blk[None, :])
        blk = L.mont_mul(spec, blk, pre)
    # batched size-A NTTs down the columns (transform axis -2)
    blk = jnp.swapaxes(blk, 0, 1)  # [bc, A, K]
    blk = _ntt_impl(blk, a.bit_length() - 1, inverse, stages, rev)
    blk = jnp.swapaxes(blk, 0, 1)  # [A, bc, K]
    # twiddle w_n^{±k1·j2}
    tw = _dev_twiddle(tw_base_blk, a)  # [A, bc, K]
    blk = L.mont_mul(spec, blk, tw)
    return jax.lax.dynamic_update_slice(x_mat, blk, (jnp.int32(0), j0, jnp.int32(0)))


@partial(jax.jit, static_argnums=(2, 3, 4), donate_argnums=(0,))
def _pass_b_block(x_mat, i0, ar: int, inverse: bool, post_on: bool,
                  stages, rev, post_rows_blk, post_cols):
    """One row block of pass B: rows [i0, i0+ar). post (when post_on):
    multiply by mont_mul(post_rows_blk[k1], post_cols[k2]), indexed by the
    natural output index k = k1 + A·k2 (coset unshift / 1-scale /
    from-Montgomery all fold in here)."""
    spec = BN254_FR
    b = x_mat.shape[1]
    blk = jax.lax.dynamic_slice(x_mat, (i0, 0, 0), (ar, b, spec.n_limbs))
    blk = _ntt_impl(blk, b.bit_length() - 1, inverse, stages, rev)
    if post_on:
        post = L.mont_mul(spec, post_rows_blk[:, None], post_cols[None, :])
        blk = L.mont_mul(spec, blk, post)
    return jax.lax.dynamic_update_slice(x_mat, blk, (i0, jnp.int32(0), jnp.int32(0)))


@partial(jax.jit, donate_argnums=(0,))
def _z_to_natural(x_mat):
    """Z[k1, k2] layout -> natural [n, K] (X[k1 + A·k2] = Z[k1, k2])."""
    a, b, k = x_mat.shape
    return jnp.transpose(x_mat, (1, 0, 2)).reshape(a * b, k)


# ---------------------------------------------------------------------------
# Full transform driver
# ---------------------------------------------------------------------------


def four_step_ntt(
    x,
    inverse: bool = False,
    pre_shift: int = 1,
    post_shift: int = 1,
    post_scale: int = 1,
    in_mont: bool = False,
    out_mont: bool = True,
    out_layout: str = "z",
):
    """NTT/iNTT of x [n, K] uint32 limbs via blocked four-step passes.

    Computes NTT_w(pre_shift^j · x_j)[k] · post_shift^k · post_scale with
    w the 2^log_n root of unity (inverted + 1/n-scaled when inverse).
    x: device or host array, PLAIN limbs unless in_mont.

    out_layout: 'z' returns the [A, B, K] matrix with Z[k1, k2] =
    X[k1 + A·k2] (the cheap layout — pointwise consumers should stay in
    it); 'natural' pays one device transpose and returns [n, K].
    """
    spec = BN254_FR
    n = x.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "size must be a power of two"
    a, b = split_ab(log_n)
    row_bytes = spec.n_limbs * 4
    bc = b // _block_count(b, a * row_bytes)
    ar = a // _block_count(a, b * row_bytes)

    w = domain_root(log_n)
    if inverse:
        w = pow(w, -1, R)
    stages_a, rev_a = _domain_tables(a.bit_length() - 1, inverse)
    stages_b, rev_b = _domain_tables(b.bit_length() - 1, inverse)
    stages_a = tuple(jnp.asarray(s) for s in stages_a)
    stages_b = tuple(jnp.asarray(s) for s in stages_b)
    rev_a = jnp.asarray(rev_a)
    rev_b = jnp.asarray(rev_b)

    # Montgomery bookkeeping (host_mont_limbs stores value·Rm):
    #   pass-A input multiply applies mont_mul(blk, mont_mul(rows, cols)) =
    #   blk · rows·cols / Rm². With rows = s^(B·i1)·Rm and cols =
    #   s^(i2)·enc·Rm the block becomes blk·s^j·enc — enc = Rm enters
    #   Montgomery form (plain input), enc = 1 keeps it (mont input).
    s = pre_shift % R
    enc = 1 if in_mont else spec.r_mod
    pre_on = not (s == 1 and in_mont)
    pre_rows = jnp.asarray(_host_pows_mont(pow(s, b, R), a))
    pre_cols = jnp.asarray(_host_pows_mont(s, b, scale=enc))
    tw_bases = jnp.asarray(_host_pows_mont(w, b))

    #   pass-B output multiply: out = blk · rows·cols / Rm² with blk =
    #   y·Rm, rows = t^{k1}·Rm, cols = t^{A·k2}·scale·dec·Rm → out =
    #   y·t^k·scale·dec·Rm; dec = 1 keeps Montgomery form, dec = Rm⁻¹
    #   leaves it.
    t = post_shift % R
    dec = 1 if out_mont else pow(spec.r_mod, -1, R)
    post_on = not (t == 1 and post_scale == 1 and out_mont)
    post_rows = jnp.asarray(_host_pows_mont(t, a))
    post_cols = jnp.asarray(
        _host_pows_mont(pow(t, a, R), b, scale=post_scale % R * dec % R)
    )

    x_mat = jnp.asarray(x).reshape(a, b, spec.n_limbs)
    for j0 in range(0, b, bc):
        x_mat = _pass_a_block(
            x_mat, jnp.int32(j0), bc, inverse, pre_on,
            stages_a, rev_a, tw_bases[j0 : j0 + bc],
            pre_rows, pre_cols[j0 : j0 + bc],
        )
    for i0 in range(0, a, ar):
        x_mat = _pass_b_block(
            x_mat, jnp.int32(i0), ar, inverse, post_on,
            stages_b, rev_b, post_rows[i0 : i0 + ar], post_cols,
        )
    if out_layout == "natural":
        return _z_to_natural(x_mat)
    return x_mat


# ---------------------------------------------------------------------------
# Blocked QAP quotient (the prover's h-operand at recursion-scale domains)
# ---------------------------------------------------------------------------


@partial(jax.jit, donate_argnums=(0,))
def _pointwise_absub(a_s, b_s, c_s, zinv_m):
    """(a·b − c)·zinv on the shared Z layout."""
    spec = BN254_FR
    num = L.sub_mod(spec, L.mont_mul(spec, a_s, b_s), c_s)
    return L.mont_mul(spec, num, zinv_m)


def _coset_transform(x_plain, shift: int):
    """plain evals [n, K] -> Montgomery coset evals in Z layout: iNTT
    (natural -> Z), transpose back to natural, forward NTT with the coset
    pre-shift fused into pass A."""
    coeffs = four_step_ntt(
        x_plain, inverse=True, in_mont=False, out_mont=True, out_layout="natural"
    )
    return four_step_ntt(
        coeffs, inverse=False, pre_shift=shift, in_mont=True,
        out_mont=True, out_layout="z",
    )


def quotient_blocked(a_plain, b_plain, c_plain, h_basis: str = "monomial",
                     shift: Optional[int] = None):
    """h-operand for the H-query MSM at large domains, HBM-bounded.

    Inputs are PLAIN-limb domain evaluations [n, K] (device or host
    uint32). Returns PLAIN-limb output [n, K] in natural order:
      * 'monomial': h(X) = (A·B − C)/Z coefficients (shift = Fr generator)
      * 'coset':    (A·B − C) evaluated on the snarkjs coset (shift =
        the 2n-th root of unity; Z division lives in the H points)
    Exactly ops.ntt.quotient / coset_qap_evals semantics — cross-checked
    bit-exactly in tests/test_ntt_blocked.py.

    Peak HBM ≈ 3 operands + one block working set (~1.7GB at the 2^23
    recursive layer-2 domain vs ~5GB for the monolithic path).
    """
    spec = BN254_FR
    n = a_plain.shape[0]
    if shift is None:
        if h_basis == "coset":
            from .ntt import snarkjs_coset_shift

            shift = snarkjs_coset_shift(n.bit_length() - 1)
        else:
            shift = FR_GENERATOR
    a_s = _coset_transform(a_plain, shift)
    b_s = _coset_transform(b_plain, shift)
    c_s = _coset_transform(c_plain, shift)
    if h_basis == "coset":
        zinv = 1  # Z is folded into the H points (snarkjs convention)
    elif h_basis == "monomial":
        zinv = pow((pow(shift, n, R) - 1) % R, -1, R)
    else:
        raise ValueError(f"unknown h_basis {h_basis!r}")
    zinv_m = jnp.asarray(host_mont_limbs([zinv])[0])
    num = _pointwise_absub(a_s, b_s, c_s, zinv_m)
    del a_s, b_s, c_s
    if h_basis == "coset":
        return _z_from_mont_natural(num)
    # monomial: num is in Z layout = natural index k1 + A·k2; transpose to
    # natural, then inverse transform + g^{-k} unshift + from-Montgomery
    # fused into pass B's post multiply
    num_nat = _z_to_natural(num)
    return four_step_ntt(
        num_nat, inverse=True, post_shift=pow(shift, -1, R),
        in_mont=True, out_mont=False, out_layout="natural",
    )


@partial(jax.jit, donate_argnums=(0,))
def _z_from_mont_natural(x_mat):
    """Z layout Montgomery -> natural-order plain limbs [n, K]."""
    x_mat = BN254_FR.from_mont(x_mat)
    a, b, k = x_mat.shape
    return jnp.transpose(x_mat, (1, 0, 2)).reshape(a * b, k)
