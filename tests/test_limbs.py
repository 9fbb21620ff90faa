"""Limb arithmetic kernels vs exact host ints: randomized cross-checks over
all field specs (BN254 Fr/Fq, secp256k1 Fq/Fr, ed25519 Fq)."""

import random

import numpy as np
import pytest

import tests.conftest  # noqa: F401  (forces CPU platform before jax import)
import jax.numpy as jnp

from zkpoa_tpu.ops import limbs as L

SPECS = [L.BN254_FR, L.BN254_FQ, L.SECP256K1_FQ, L.SECP256K1_FR, L.ED25519_FQ]
rng = random.Random(0xC0FFEE)


def _rand_batch(spec, n):
    return [rng.randrange(spec.modulus) for _ in range(n)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_limb_conversion_roundtrip(spec):
    vals = _rand_batch(spec, 8) + [0, 1, spec.modulus - 1]
    arr = spec.to_limbs(vals)
    back = spec.from_limbs(arr)
    assert list(back) == vals


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_sub_mod(spec):
    n = 16
    a = _rand_batch(spec, n)
    b = _rand_batch(spec, n)
    a[0], b[0] = spec.modulus - 1, spec.modulus - 1  # max wrap
    a[1], b[1] = 0, spec.modulus - 1
    aj, bj = jnp.asarray(spec.to_limbs(a)), jnp.asarray(spec.to_limbs(b))
    s = spec.from_limbs(np.asarray(L.add_mod(spec, aj, bj)))
    d = spec.from_limbs(np.asarray(L.sub_mod(spec, aj, bj)))
    for i in range(n):
        assert s[i] == (a[i] + b[i]) % spec.modulus, f"add {i}"
        assert d[i] == (a[i] - b[i]) % spec.modulus, f"sub {i}"


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mont_mul(spec):
    n = 16
    a = _rand_batch(spec, n)
    b = _rand_batch(spec, n)
    a[0], b[0] = spec.modulus - 1, spec.modulus - 1
    a[1], b[1] = 0, 12345
    a[2], b[2] = 1, spec.modulus - 1
    am, bm = spec.encode(a), spec.encode(b)
    prod = spec.decode(L.mont_mul(spec, am, bm))
    for i in range(n):
        assert prod[i] == a[i] * b[i] % spec.modulus, f"mul {i}"


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mont_encode_decode_roundtrip(spec):
    vals = _rand_batch(spec, 8) + [0, 1, spec.modulus - 1]
    assert list(spec.decode(spec.encode(vals))) == vals


def test_mont_pow5():
    spec = L.BN254_FR
    vals = _rand_batch(spec, 8)
    out = spec.decode(L.mont_pow5(spec, spec.encode(vals)))
    for i, v in enumerate(vals):
        assert out[i] == pow(v, 5, spec.modulus)


def test_neg_and_select():
    spec = L.BN254_FR
    vals = [5, 0, spec.modulus - 1]
    out = spec.decode(L.neg_mod(spec, spec.encode(vals)))
    assert list(out) == [(-v) % spec.modulus for v in vals]
    a = spec.encode([1, 2])
    b = spec.encode([3, 4])
    sel = spec.decode(L.select(jnp.array([True, False]), a, b))
    assert list(sel) == [1, 4]
