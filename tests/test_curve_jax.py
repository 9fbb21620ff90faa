"""Batched Jacobian curve ops vs exact host curve math (BN254 G1 and
secp256k1), including all exceptional cases of the unified add."""

import random

import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax.numpy as jnp

from zkpoa_tpu.fields import bn254, secp256k1
from zkpoa_tpu.ops import curve_jax as C
from zkpoa_tpu.ops import limbs as L

rng = random.Random(42)


def _bn254_points(n):
    return [bn254.g1_mul(bn254.G1_GEN, rng.randrange(1, bn254.R)) for _ in range(n)]


def _secp_points(n):
    return [secp256k1.mul(secp256k1.G, rng.randrange(1, secp256k1.N)) for _ in range(n)]


def test_bn254_unified_add_all_cases():
    ops = C.BN254_G1
    pts = _bn254_points(4)
    g = bn254.G1_GEN
    # pairs: generic, P==Q (double), P==-Q (infinity), P+inf, inf+Q, inf+inf
    p_list = [pts[0], pts[1], pts[2], pts[3], None, None]
    q_list = [pts[1], pts[1], bn254.g1_neg(pts[2]), None, g, None]
    expected = [bn254.g1_add(p, q) for p, q in zip(p_list, q_list)]
    out = ops.decode_jac(ops.add(ops.encode_jac(p_list), ops.encode_jac(q_list)))
    assert out == expected


def test_bn254_double():
    ops = C.BN254_G1
    pts = _bn254_points(3) + [None]
    expected = [bn254.g1_add(p, p) for p in pts]
    out = ops.decode_jac(ops.double(ops.encode_jac(pts)))
    assert out == expected


def test_bn254_add_affine_mixed():
    ops = C.BN254_G1
    p_list = _bn254_points(3) + [None, _bn254_points(1)[0]]
    q_list = _bn254_points(3) + [_bn254_points(1)[0], None]
    # make one pair a doubling case
    p_list[1] = q_list[1]
    expected = [bn254.g1_add(p, q) for p, q in zip(p_list, q_list)]
    xq, yq, valid = ops.encode_affine(q_list)
    out = ops.decode_jac(ops.add_affine(ops.encode_jac(p_list), xq, yq, valid))
    assert out == expected


def test_secp_unified_add():
    ops = C.SECP256K1
    pts = _secp_points(4)
    expected = [secp256k1.add(pts[0], pts[1]), secp256k1.add(pts[2], pts[2])]
    out = ops.decode_jac(
        ops.add(ops.encode_jac([pts[0], pts[2]]), ops.encode_jac([pts[1], pts[2]]))
    )
    assert out == expected


def test_bn254_scalar_mul_batch():
    ops = C.BN254_G1
    scalars = [rng.randrange(bn254.R) for _ in range(4)] + [0, 1]
    base = bn254.G1_GEN
    expected = [bn254.g1_mul(base, k) for k in scalars]
    base_jac = ops.encode_jac([base] * len(scalars))
    sc = jnp.asarray(L.BN254_FR.to_limbs(scalars))
    out = ops.decode_jac(ops.scalar_mul_batch(base_jac, sc, 254))
    assert out == expected


def test_secp_scalar_mul_matches_pubkey_derivation():
    ops = C.SECP256K1
    pvts = [rng.randrange(1, secp256k1.N) for _ in range(3)]
    expected = [secp256k1.pubkey_from_private(k) for k in pvts]
    base = ops.encode_jac([secp256k1.G] * 3)
    sc = jnp.asarray(L.SECP256K1_FR.to_limbs(pvts))
    out = ops.decode_jac(ops.scalar_mul_batch(base, sc, 256))
    assert out == expected
