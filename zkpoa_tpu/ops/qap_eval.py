"""Device-side sparse R1CS evaluation: the QAP domain evaluations
<A_i,w>, <B_i,w>, <C_i,w> as a TPU sparse-matrix-vector product over Fr.

Role: what circom's generated C++ witness/constraint evaluation plus
rapidsnark's buildABC do on CPU (reference scripts/g16_prove.sh:229-252,
SURVEY.md §2.5). Round 2 evaluated the matrices with a pure-Python loop
over ~30M sparse rows per prove (minutes at the recursive layer-2 scale,
and the row tuples dominated the 29GB build RSS — VERDICT r2 items 4/6/9).
Here the rows live as packed numpy int32 triples plus a dictionary-encoded
coefficient pool (models/r1cs.py R1CS.pack), and the evaluation runs on
device in fixed-shape chunks:

  * products: one Montgomery mul per row — mont_mul(pool_mont[cid],
    wit_plain[wire]) = coeff·wit mod p in PLAIN limbs (the Montgomery
    factors cancel), limbs normalized < 2^16;
  * accumulation: scatter-add into a uint32 [domain+1, K] accumulator.
    Limb-wise sums of k terms stay < k·2^16 « 2^32 for any realistic
    constraint fan-in (< 2^16 rows per constraint), so the adds are
    carry-free; padded rows scatter to the sentinel row `domain`;
  * reduction: one carry normalization, then value = lo + extra·2^256
    reduced exactly via two Montgomery muls with R² (mont_mul(x, R²) =
    x·2^256 mod p) and an add_mod.

The outputs are plain-limb [domain, K] device arrays — exactly the
blocked four-step quotient's input format, so the whole witness -> h
pipeline stays on device with one witness upload.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as L
from .limbs import BN254_FR, _carry_normalize

CHUNK_ROWS = 1 << 22  # fixed scatter-chunk shape (one compile per n_wires)


@partial(jax.jit, donate_argnums=(0,))
def _accum_rows(acc, pool_mont, wit_plain, cid, wire, idx):
    """acc[idx] += pool[cid]·wit[wire] (plain limbs, carry-free adds)."""
    prod = L.mont_mul(BN254_FR, pool_mont[cid], wit_plain[wire])
    return acc.at[idx].add(prod)


def _mod_reduce_core(acc):
    """uint32 [n, K] limb-wise sums -> exact values mod p (plain limbs)."""
    spec = BN254_FR
    k = spec.n_limbs
    limbs, extra = _carry_normalize(acc, k)
    r2 = jnp.asarray(spec.r2_limbs)
    # lo (< 2^256) mod p: to Montgomery form and straight back out
    lo = spec.from_mont(L.mont_mul(spec, limbs, r2))
    e = jnp.zeros_like(limbs)
    e = e.at[..., 0].set(extra & jnp.uint32(0xFFFF))
    e = e.at[..., 1].set(extra >> 16)
    hi = L.mont_mul(spec, e, r2)  # extra·2^256 mod p
    return L.add_mod(spec, lo, hi)


_mod_reduce_rows = partial(jax.jit, donate_argnums=(0,))(_mod_reduce_core)

SAFE_CHUNK = 1 << 16  # rows per scatter chunk on the overflow-safe path:
# after a modular reduce, acc limbs are < 2^16 (one term); adding 2^16
# more sub-2^16 products peaks at (2^16-1)(2^16+1) = 2^32 - 1 — exactly
# the uint32 ceiling.


@partial(jax.jit, static_argnums=(5,))
def _spmv_safe(pool_mont, vec_dev, cid, gat, idx, out_size: int):
    """Scatter-accumulate with a modular reduce after EVERY 2^16-row
    chunk: correct for ANY scatter fan-in. The fast path's carry-free
    adds overflow once one target collects >= 2^16 rows — the setup's
    per-wire direction hits that immediately (wire 0, the constant,
    appears in nearly every constraint). One fori program, row arrays
    pre-padded to a SAFE_CHUNK multiple."""
    spec = BN254_FR
    nch = idx.shape[0] // SAFE_CHUNK
    idx2 = idx.reshape(nch, SAFE_CHUNK)
    gat2 = gat.reshape(nch, SAFE_CHUNK)
    cid2 = cid.reshape(nch, SAFE_CHUNK)

    def body(i, acc):
        prod = L.mont_mul(BN254_FR, pool_mont[cid2[i]], vec_dev[gat2[i]])
        acc = acc.at[idx2[i]].add(prod)
        return _mod_reduce_core(acc)

    acc = jnp.zeros((out_size + 1, spec.n_limbs), jnp.uint32)
    return jax.lax.fori_loop(0, nch, body, acc)[:out_size]


def _spmv(scatter_np, gather_np, cid_np, pool_mont, vec_dev,
          out_size: int, max_fanin: Optional[int] = None) -> jnp.ndarray:
    """Generic sparse accumulate: out[scatter] += pool[cid]·vec[gather]
    over packed int32 rows, chunked at fixed shapes. Serves both
    directions: the prover's per-constraint evaluations (scatter =
    constraint, gather = wire) and the setup's per-wire QAP polys at tau
    (scatter = wire, gather = constraint — rapidsnark's zkey_new Lagrange
    accumulation). When any scatter target collects >= 2^16 rows (always
    true per-wire: the constant wire is everywhere), the overflow-safe
    reduce-every-chunk path runs instead of the carry-free one."""
    spec = BN254_FR
    m = len(scatter_np)
    if max_fanin is None:
        max_fanin = int(np.bincount(scatter_np, minlength=1).max()) if m else 0
    if max_fanin >= SAFE_CHUNK:
        pad = (-m) % SAFE_CHUNK
        idx = np.concatenate([scatter_np, np.full(pad, out_size, np.int32)])
        gat = np.concatenate([gather_np, np.zeros(pad, np.int32)])
        cid = np.concatenate([cid_np, np.zeros(pad, np.int32)])
        return _spmv_safe(pool_mont, vec_dev, jnp.asarray(cid),
                          jnp.asarray(gat), jnp.asarray(idx), out_size)
    acc = jnp.zeros((out_size + 1, spec.n_limbs), jnp.uint32)
    for off in range(0, max(m, 1), CHUNK_ROWS):
        idx = scatter_np[off : off + CHUNK_ROWS]
        gat = gather_np[off : off + CHUNK_ROWS]
        cid = cid_np[off : off + CHUNK_ROWS]
        pad = CHUNK_ROWS - len(idx)
        if pad:
            idx = np.concatenate([idx, np.full(pad, out_size, np.int32)])
            gat = np.concatenate([gat, np.zeros(pad, np.int32)])
            cid = np.concatenate([cid, np.zeros(pad, np.int32)])
        acc = _accum_rows(
            acc, pool_mont, vec_dev,
            jnp.asarray(cid), jnp.asarray(gat), jnp.asarray(idx),
        )
    return _mod_reduce_rows(acc)[:out_size]


def _eval_one(mat, pool_mont, wit_dev, domain_size: int) -> jnp.ndarray:
    """One matrix: packed (idx, wire, cid) int32 numpy rows -> [domain, K]
    plain-limb evaluations on device."""
    return _spmv(mat.idx, mat.wire, mat.cid, pool_mont, wit_dev, domain_size)


def eval_at_tau_device(packed, lag_plain, n_wires: int):
    """Setup-side transposed SpMV: per-wire A_k(tau), B_k(tau), C_k(tau)
    from Lagrange values lag_plain [m, K] (plain limbs, device). Returns
    three [n_wires, K] plain-limb device arrays — the host loop this
    replaces walked ~30M rows of Python bigint math per setup."""
    pool_mont = BN254_FR.to_mont(jnp.asarray(packed.pool_limbs))
    lag_dev = jnp.asarray(lag_plain)
    a_t = _spmv(packed.a.wire, packed.a.idx, packed.a.cid, pool_mont, lag_dev, n_wires)
    b_t = _spmv(packed.b.wire, packed.b.idx, packed.b.cid, pool_mont, lag_dev, n_wires)
    c_t = _spmv(packed.c.wire, packed.c.idx, packed.c.cid, pool_mont, lag_dev, n_wires)
    return a_t, b_t, c_t


@jax.jit
def _ab_pointwise(a_ev, b_ev):
    """C = A·B pointwise (zkey-imported systems store no C matrix)."""
    spec = BN254_FR
    r2 = jnp.asarray(spec.r2_limbs)
    am = L.mont_mul(spec, a_ev, r2)
    return L.mont_mul(spec, am, b_ev)


def eval_matrices_device(
    packed, witness_limbs: np.ndarray, domain_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Packed R1CS (models/r1cs.py R1CS.pack()) + plain witness limbs
    [n_wires, K] -> (a, b, c) PLAIN-limb [domain, K] device arrays,
    zero-padded beyond n_constraints. `c` falls back to A·B pointwise when
    the system carries no C rows (a .zkey stores none)."""
    pool_mont = BN254_FR.to_mont(jnp.asarray(packed.pool_limbs))
    wit_dev = jnp.asarray(witness_limbs)
    a_ev = _eval_one(packed.a, pool_mont, wit_dev, domain_size)
    b_ev = _eval_one(packed.b, pool_mont, wit_dev, domain_size)
    if len(packed.c.idx) == 0 and packed.n_constraints:
        c_ev = _ab_pointwise(a_ev, b_ev)
    else:
        c_ev = _eval_one(packed.c, pool_mont, wit_dev, domain_size)
    return a_ev, b_ev, c_ev
