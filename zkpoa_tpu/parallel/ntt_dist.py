"""Distributed NTT over a device mesh: four-step decomposition with one
all_to_all per transform (SURVEY.md §2.6/§7's "NTT butterfly stage
exchanges" — the intra-proof parallelism the reference cannot do; its FFT
lives single-process inside rapidsnark).

Four-step: with n = A*B and x viewed as a matrix [A, B] (coefficient
i = i1*B + i2 at [i1, i2]),

    X[k1 + A*k2] = NTT_B over i2 ( w_n^{i2*k1} * NTT_A over i1 (x)[k1, i2] )

so the full transform is: (1) local size-A NTTs down the columns (data
sharded over columns, so each device transforms its own column block),
(2) a local twiddle multiply, (3) an all_to_all that reshards columns ->
rows (the only communication), (4) local size-B NTTs along the rows.
The output Z[k1, k2] = X[k1 + A*k2] lives row-sharded ("transposed evals"
layout); the inverse transform runs the steps backwards and returns the
natural column-sharded coefficient layout, so a full iNTT/pointwise/NTT
pipeline (the QAP quotient) needs exactly two all_to_alls per operand.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..fields.bn254 import FR_GENERATOR, R
from ..ops import limbs as L
from ..ops.limbs import BN254_FR
from ..ops.ntt import _domain_tables, domain_root, ntt, snarkjs_coset_shift


def _pow_table(base: int, count: int) -> np.ndarray:
    from ..ops.ntt import host_mont_limbs

    pw = [1] * count
    for j in range(1, count):
        pw[j] = pw[j - 1] * base % R
    return host_mont_limbs(pw)


def _mont_pow_gather(w_pows: jnp.ndarray, exps: jnp.ndarray) -> jnp.ndarray:
    """w^exps via gather from a dense power table [n, K]."""
    return w_pows[exps]


def ntt_dist_local(x_local, log_n: int, ndev: int, axis: str, inverse: bool,
                   w_pows):
    """The shard_map-local body of the distributed transform.

    Forward: x_local [A, B/D, K] natural coeffs (column block) ->
    z_local [A/D, B, K] transposed evals (row block).
    Inverse: exact reverse."""
    n = 1 << log_n
    spec = BN254_FR
    if inverse:
        # z_local [A/D, B, K]: undo step 4 (row NTTs), untwiddle, all_to_all
        # back (rows -> columns), undo step 1 (column NTTs).
        b = x_local.shape[1]
        z = ntt(x_local, inverse=True)  # inverse size-B NTTs along rows
        # this block holds rows k1 in [idx*A/D, (idx+1)*A/D)
        idx = jax.lax.axis_index(axis)
        a_loc = x_local.shape[0]
        k1 = idx * a_loc + jnp.arange(a_loc)
        i2 = jnp.arange(b)
        exps = (k1[:, None] * i2[None, :]) % n  # w^{-i2 k1} via inverse table
        z = L.mont_mul(spec, z, _mont_pow_gather(w_pows, exps))
        # reshard rows -> columns: [A/D, B, K] -> [A, B/D, K]
        z = jax.lax.all_to_all(z, axis, split_axis=1, concat_axis=0, tiled=True)
        # inverse size-A NTTs down the columns
        z = jnp.swapaxes(z, 0, 1)  # [B/D, A, K]
        z = ntt(z, inverse=True)
        return jnp.swapaxes(z, 0, 1)
    else:
        a = x_local.shape[0]
        b_loc = x_local.shape[1]
        # step 1: size-A NTTs down the columns (transform axis -2 = rows)
        y = jnp.swapaxes(x_local, 0, 1)  # [B/D, A, K]
        y = ntt(y, inverse=False)
        y = jnp.swapaxes(y, 0, 1)  # [A, B/D, K]
        # step 2: twiddle w^{i2*k1}, i2 global column index of this block
        idx = jax.lax.axis_index(axis)
        i2 = idx * b_loc + jnp.arange(b_loc)
        k1 = jnp.arange(a)
        exps = (k1[:, None] * i2[None, :]) % n
        y = L.mont_mul(spec, y, _mont_pow_gather(w_pows, exps))
        # step 3: all_to_all, columns -> rows: [A, B/D, K] -> [A/D, B, K]
        y = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=1, tiled=True)
        # step 4: size-B NTTs along the rows
        return ntt(y, inverse=False)


def _split_ab(n: int, ndev: int) -> Tuple[int, int]:
    """Pick A, B with n = A*B, both multiples of ndev, A as square-ish."""
    log_n = n.bit_length() - 1
    la = log_n // 2
    a = 1 << la
    b = n // a
    assert a % ndev == 0 and b % ndev == 0, (
        f"four-step split A={a}, B={b} must both be divisible by {ndev}"
    )
    return a, b


def quotient_dist(a_ev, b_ev, c_ev, mesh: Mesh, axis: str = "data"):
    """Distributed QAP quotient h(X) = (A*B - C)/Z: the multi-chip version
    of ops.ntt.quotient. Inputs are NATURAL-order domain evaluations
    [n, K] (replicated or host arrays); output is h coefficients [n, K]
    in natural order. Each of the 7 transforms does one all_to_all;
    everything else is elementwise on the shards."""
    from jax import shard_map

    spec = BN254_FR
    n = a_ev.shape[0]
    log_n = n.bit_length() - 1
    ndev = mesh.shape[axis]
    a, b = _split_ab(n, ndev)

    w_fwd = jnp.asarray(_pow_table(domain_root(log_n), n))
    w_inv = jnp.asarray(_pow_table(pow(domain_root(log_n), -1, R), n))
    g = FR_GENERATOR
    ginv = pow(g, -1, R)
    n_inv = pow(n, -1, R)
    from ..ops.ntt import host_mont_limbs

    zc_inv = pow((pow(g, n, R) - 1) % R, -1, R)
    zinv_m = jnp.asarray(host_mont_limbs([zc_inv])[0])

    # natural evals [n] -> transposed-evals layout Z[k1, k2] = ev[k1 + A*k2]
    def to_L1(ev):
        return jnp.swapaxes(ev.reshape(b, a, spec.n_limbs), 0, 1)

    def from_L0(coeff_mat):  # [A, B, K] natural matrix -> [n, K]
        return coeff_mat.reshape(n, spec.n_limbs)

    g_pows = jnp.asarray(_pow_table(g, n))
    ginv_pows = jnp.asarray(_pow_table(ginv, n))

    def local(a_l1, b_l1, c_l1):
        # inverse transform: transposed evals -> natural coeffs (col block)
        def intt(z):
            y = ntt_dist_local(z, log_n, ndev, axis, True, w_inv)
            # scale by 1/n (the local inverse sub-transforms already divide
            # by A and B, and A*B = n, so nothing more to do)
            return y

        def fwd_coset(coef, pows):
            # coset scale in natural coefficient layout (column block)
            idx = jax.lax.axis_index(axis)
            b_loc = coef.shape[1]
            i1 = jnp.arange(coef.shape[0])
            i2 = idx * b_loc + jnp.arange(b_loc)
            gexp = (i1[:, None] * b + i2[None, :]) % n  # global coeff index
            coef = L.mont_mul(spec, coef, pows[gexp])
            return ntt_dist_local(coef, log_n, ndev, axis, False, w_fwd)

        a_c = intt(a_l1)
        b_c = intt(b_l1)
        c_c = intt(c_l1)
        a_s = fwd_coset(a_c, g_pows)
        b_s = fwd_coset(b_c, g_pows)
        c_s = fwd_coset(c_c, g_pows)
        num = L.sub_mod(spec, L.mont_mul(spec, a_s, b_s), c_s)
        h_s = L.mont_mul(spec, num, zinv_m)
        h_c = ntt_dist_local(h_s, log_n, ndev, axis, True, w_inv)
        # unscale g^-i in natural coefficient layout
        idx = jax.lax.axis_index(axis)
        b_loc = h_c.shape[1]
        i1 = jnp.arange(h_c.shape[0])
        i2 = idx * b_loc + jnp.arange(b_loc)
        gexp = (i1[:, None] * b + i2[None, :]) % n
        return L.mont_mul(spec, h_c, ginv_pows[gexp])

    fn = shard_map(
        local,
        mesh=mesh,
        # inputs in transposed-evals layout are ROW-sharded [A/D, B, K];
        # the output natural coefficient matrix is COLUMN-sharded [A, B/D, K]
        in_specs=(P(axis, None), P(axis, None), P(axis, None)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    h_mat = fn(to_L1(a_ev), to_L1(b_ev), to_L1(c_ev))  # [A, B, K] natural
    return from_L0(h_mat)
