"""Pallas fused-kernel equivalence vs the jnp limb substrate.

On CPU the kernels run in interpreter mode — mont_mul is cheap enough to
check there; the fused point kernels (thousands of interpreted primitive
ops) are checked on real TPU (see /tmp-free run in bench/CI on hardware) and
marked slow here so the CPU suite stays fast."""

import random

import numpy as np
import pytest

import tests.conftest as cft  # noqa: F401
from zkpoa_tpu.fields import bn254
from zkpoa_tpu.ops import curve_jax as CJ
from zkpoa_tpu.ops import limbs as L
from zkpoa_tpu.ops import pallas_field as PF
from zkpoa_tpu.ops.curve_jax import BN254_G1
from zkpoa_tpu.ops.limbs import BN254_FQ


def test_pallas_mont_mul_matches_jnp():
    r = random.Random(5)
    vals_a = [r.randrange(BN254_FQ.modulus) for _ in range(50)]
    vals_b = [r.randrange(BN254_FQ.modulus) for _ in range(50)]
    a = BN254_FQ.encode(vals_a)
    b = BN254_FQ.encode(vals_b)
    ref = np.asarray(L.mont_mul(BN254_FQ, a, b))
    got = np.asarray(PF.mont_mul_tpu(BN254_FQ, a, b))
    assert (ref == got).all()


@pytest.mark.slow
def test_pallas_point_ops_match_jnp():
    """Full fused point-op equivalence incl. exceptional cases (double,
    cancel, infinity, invalid). Slow in interpret mode; fast on TPU."""
    pts = [bn254.g1_mul(bn254.G1_GEN, k) for k in range(1, 8)]
    pts2 = [bn254.g1_mul(bn254.G1_GEN, 100 + k) for k in range(7)]
    xs, ys, valid = BN254_G1.encode_affine(
        pts2 + [pts[0], bn254.g1_neg(pts[0]), pts[5]]
    )
    valid = valid.at[3].set(False)
    p_jac = BN254_G1.encode_jac(pts + [pts[0], pts[0], pts[6]])
    ar = BN254_G1.arith()

    ref = CJ.jac_add_affine(ar, p_jac, xs, ys, valid)
    got = PF.jac_add_affine_tpu(BN254_FQ, p_jac, xs, ys, valid)
    assert all((np.asarray(r0) == np.asarray(g0)).all() for r0, g0 in zip(ref, got))

    ref = CJ.jac_add(ar, p_jac, p_jac)
    got = PF.jac_add_tpu(BN254_FQ, p_jac, p_jac)
    assert all((np.asarray(r0) == np.asarray(g0)).all() for r0, g0 in zip(ref, got))

    ref = CJ.jac_double(ar, p_jac)
    got = PF.jac_double_tpu(BN254_FQ, p_jac)
    assert all((np.asarray(r0) == np.asarray(g0)).all() for r0, g0 in zip(ref, got))
