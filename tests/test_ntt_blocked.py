"""Bit-exactness of the blocked four-step NTT / QAP quotient against the
monolithic ops.ntt path (which is itself golden-tested against the
snarkjs/rapidsnark conventions)."""

import numpy as np
import pytest

from conftest import *  # noqa: F401,F403  (forces the CPU backend)

import jax.numpy as jnp

from zkpoa_tpu.fields.bn254 import R
from zkpoa_tpu.ops import ntt_blocked as NB
from zkpoa_tpu.ops.limbs import BN254_FR
from zkpoa_tpu.ops.msm_pallas import scalars_to_limbs_fast
from zkpoa_tpu.ops.ntt import coset_qap_evals, ntt, quotient, snarkjs_coset_shift


def _rand_plain(n, seed):
    rng = np.random.default_rng(seed)
    vals = [int.from_bytes(rng.bytes(32), "little") % R for _ in range(n)]
    return vals, scalars_to_limbs_fast(vals)


def _decode(plain_limbs):
    return [int(x) for x in BN254_FR.from_limbs(np.asarray(plain_limbs))]


@pytest.mark.parametrize("log_n", [6, 7])
@pytest.mark.parametrize("inverse", [False, True])
def test_four_step_matches_monolithic(log_n, inverse):
    n = 1 << log_n
    vals, plain = _rand_plain(n, 1000 + log_n)
    ref = BN254_FR.decode(ntt(BN254_FR.encode(vals), inverse=inverse))
    got = _decode(
        NB.four_step_ntt(plain, inverse=inverse, out_mont=False, out_layout="natural")
    )
    assert got == [int(x) for x in ref]


def test_four_step_pre_post_shift():
    """pre/post shifts against a direct host evaluation."""
    log_n, n = 6, 64
    vals, plain = _rand_plain(n, 7)
    g = 5
    t = 7
    scale = 1234567
    got = _decode(
        NB.four_step_ntt(
            plain, pre_shift=g, post_shift=t, post_scale=scale,
            out_mont=False, out_layout="natural",
        )
    )
    from zkpoa_tpu.ops.ntt import domain_root

    w = domain_root(log_n)
    shifted = [v * pow(g, j, R) % R for j, v in enumerate(vals)]
    ref = [
        sum(shifted[j] * pow(w, j * k, R) for j in range(n)) % R
        * pow(t, k, R) % R * scale % R
        for k in range(n)
    ]
    assert got == ref


def test_four_step_multi_block(monkeypatch):
    """Force multiple blocks per pass; results must not change."""
    n = 1 << 8
    vals, plain = _rand_plain(n, 42)
    one_block = _decode(NB.four_step_ntt(plain, out_mont=False, out_layout="natural"))
    monkeypatch.setattr(NB, "BLOCK_TARGET_BYTES", 4 * 16 * 4)  # tiny blocks
    multi = _decode(NB.four_step_ntt(plain, out_mont=False, out_layout="natural"))
    assert one_block == multi
    ref = BN254_FR.decode(ntt(BN254_FR.encode(vals)))
    assert multi == [int(x) for x in ref]


@pytest.mark.parametrize("h_basis", ["monomial", "coset"])
def test_quotient_blocked_matches(h_basis, monkeypatch):
    """quotient_blocked == quotient / coset_qap_evals bit-exactly, for a
    satisfying (A·B = C pointwise) system, multi-block."""
    n = 1 << 7
    a_vals, a_plain = _rand_plain(n, 1)
    b_vals, b_plain = _rand_plain(n, 2)
    c_vals = [a * b % R for a, b in zip(a_vals, b_vals)]
    c_plain = scalars_to_limbs_fast(c_vals)
    monkeypatch.setattr(NB, "BLOCK_TARGET_BYTES", 16 * 16 * 4)

    a_m = BN254_FR.encode(a_vals)
    b_m = BN254_FR.encode(b_vals)
    c_m = BN254_FR.encode(c_vals)
    if h_basis == "monomial":
        ref = BN254_FR.decode(quotient(a_m, b_m, c_m))
    else:
        ref = BN254_FR.decode(
            coset_qap_evals(a_m, b_m, c_m, shift=snarkjs_coset_shift(7))
        )
    got = _decode(NB.quotient_blocked(a_plain, b_plain, c_plain, h_basis=h_basis))
    assert got == [int(x) for x in ref]
