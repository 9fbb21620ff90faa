"""Batched Poseidon permutation on TPU (JAX on the limb substrate).

The hot path of the Merkle engine (leaf + node hashing over millions of
rows) and of witness generation for the layer-2 Poseidon gadgets. The whole
permutation for a batch runs inside one jit: 65(+) rounds of
ark -> sbox -> MDS-mix on uint32 limb arrays, which XLA fuses into VPU code.
Cross-checked against the exact host implementation (zkpoa_tpu.ops.poseidon)
in tests; parameters are the circomlib-compatible ones from poseidon_params.

Replaces: the reference's sequential Rust Merkle hashing (scripts/
merkle_tree.rs:206-269, noted 2.5 h at 10M leaves) and circomlibjs Poseidon
calls in input prep (scripts/input_prep_for_layer_two.ts:46-79).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as L
from .limbs import BN254_FR
from .poseidon_params import R_F, n_partial_rounds, poseidon_params


@lru_cache(maxsize=None)
def _params_mont(t: int) -> Tuple[np.ndarray, np.ndarray]:
    """Round constants [(R_F+R_P), t, K] and MDS [t, t, K], Montgomery limbs."""
    consts, mds = poseidon_params(t)
    r_p = n_partial_rounds(t)
    n_rounds = R_F + r_p
    spec = BN254_FR
    c = np.asarray(
        spec.to_limbs([[consts[r * t + i] for i in range(t)] for r in range(n_rounds)])
    )
    m = np.asarray(spec.to_limbs([[mds[i][j] for j in range(t)] for i in range(t)]))
    # encode to Montgomery once (host->device->host; cached)
    c_m = np.asarray(spec.to_mont(jnp.asarray(c)))
    m_m = np.asarray(spec.to_mont(jnp.asarray(m)))
    return c_m, m_m


def _mix(state: jnp.ndarray, mds_m: jnp.ndarray) -> jnp.ndarray:
    """state: [B, t, K] -> [B, t, K]; new[i] = sum_j M[i][j]*s[j]."""
    spec = BN254_FR
    t = state.shape[-2]
    prod = L.mont_mul(spec, mds_m[None, :, :, :], state[:, None, :, :])  # [B,t,t,K]
    acc = prod[:, :, 0, :]
    for j in range(1, t):
        acc = L.add_mod(spec, acc, prod[:, :, j, :])
    return acc


def permute(t: int, state: jnp.ndarray) -> jnp.ndarray:
    """Full Poseidon permutation. state: [B, t, K] Montgomery limbs."""
    consts_m, mds_m = _params_mont(t)  # host-side, cached; safe outside jit
    return _permute_impl(t, state, jnp.asarray(consts_m), jnp.asarray(mds_m))


@partial(jax.jit, static_argnums=0)
def _permute_impl(
    t: int, state: jnp.ndarray, consts_m: jnp.ndarray, mds_m: jnp.ndarray
) -> jnp.ndarray:
    """Rounds run as a fori_loop (round constants gathered by index, the
    full/partial sbox chosen by a traced predicate) so the compiled graph is
    ONE round body, not R_F+R_P unrolled copies — that keeps XLA compiles
    in the milliseconds for every width t."""
    spec = BN254_FR
    r_p = n_partial_rounds(t)
    half = R_F // 2

    def round_body(r, state):
        state = L.add_mod(spec, state, consts_m[r][None, :, :])
        full = jnp.logical_or(r < half, r >= half + r_p)
        pow5 = L.mont_pow5(spec, state)
        head = pow5[:, :1, :]
        rest = jnp.where(full, pow5[:, 1:, :], state[:, 1:, :])
        state = jnp.concatenate([head, rest], axis=1)
        return _mix(state, mds_m)

    return jax.lax.fori_loop(0, R_F + r_p, round_body, state)


def poseidon_ex_batch(
    inputs: jnp.ndarray, initial_state: jnp.ndarray, n_outs: int = 1
) -> jnp.ndarray:
    """circomlib PoseidonEx, batched. inputs: [B, n, K] mont; initial_state:
    [B, K] mont. Returns [B, n_outs, K] mont."""
    state = jnp.concatenate([initial_state[:, None, :], inputs], axis=1)
    out = permute(state.shape[1], state)
    return out[:, :n_outs, :]


def hash2(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """Poseidon(2) batched: left/right [B, K] mont -> [B, K] mont.
    The Merkle node/leaf hash."""
    zero = jnp.zeros_like(left)
    state = jnp.stack([zero, left, right], axis=1)  # [B, 3, K]
    return permute(3, state)[:, 0, :]


def sponge_batch(inputs: jnp.ndarray) -> jnp.ndarray:
    """PoseidonSponge batched (circuits/poseidon.circom semantics):
    inputs [B, L, K] mont -> [B, K] mont. L static."""
    B, length, K = inputs.shape
    chunk = 16
    num_rounds = (length + chunk - 1) // chunk
    state0 = jnp.zeros((B, K), dtype=jnp.uint32)
    for i in range(num_rounds):
        part = inputs[:, i * chunk : (i + 1) * chunk, :]
        last = i == num_rounds - 1
        outs = poseidon_ex_batch(part, state0, 2 if last else 1)
        if last:
            return outs[:, 1, :]
        state0 = outs[:, 0, :]
    raise AssertionError("unreachable")


# ---------------------------------------------------------------------------
# Convenience int-level wrappers (host conversions at the edges)
# ---------------------------------------------------------------------------


def poseidon_many(rows) -> np.ndarray:
    """rows: [B, n] python ints -> [B] ints. One batched device call."""
    spec = BN254_FR
    rows = list(rows)
    b = len(rows)
    n = len(rows[0])
    enc = spec.encode(rows)  # [B, n, K]
    zero = jnp.zeros((b, spec.n_limbs), dtype=jnp.uint32)
    out = poseidon_ex_batch(enc, zero, 1)[:, 0, :]
    return spec.decode(out)
