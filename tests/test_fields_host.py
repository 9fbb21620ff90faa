"""Host field-core tests: BN254 tower/pairing, secp256k1 ECDSA*, curve25519
Pedersen — including bit-exactness checks against the reference's golden
artifacts (read from /root/reference/tests/**, never copied)."""

import json
import os

import pytest

from tests.conftest import has_reference, reference_path
from zkpoa_tpu.fields import bn254, curve25519, secp256k1
from zkpoa_tpu.utils import serde


# ---------------------------------------------------------------------------
# BN254 tower
# ---------------------------------------------------------------------------


def test_fp2_inv_roundtrip():
    a = (12345678901234567890, 98765432109876543210)
    assert bn254.fp2_mul(a, bn254.fp2_inv(a)) == bn254.FP2_ONE


def test_fp6_inv_roundtrip():
    a = ((1, 2), (3, 4), (5, 6))
    assert bn254.fp6_mul(a, bn254.fp6_inv(a)) == bn254.FP6_ONE


def test_fp12_inv_roundtrip():
    a = (((1, 2), (3, 4), (5, 6)), ((7, 8), (9, 10), (11, 12)))
    assert bn254.fp12_mul(a, bn254.fp12_inv(a)) == bn254.FP12_ONE


def test_fp12_frobenius_matches_pow():
    a = (((1, 2), (3, 4), (5, 6)), ((7, 8), (9, 10), (11, 12)))
    assert bn254.fp12_frobenius(a) == bn254.fp12_pow(a, bn254.P)


def test_g1_g2_generators_on_curve():
    assert bn254.g1_is_on_curve(bn254.G1_GEN)
    assert bn254.g2_is_on_curve(bn254.G2_GEN)
    # subgroup order checks
    assert bn254.g1_mul(bn254.G1_GEN, bn254.R) is None
    assert bn254.g2_mul(bn254.G2_GEN, bn254.R) is None


def test_untwisted_g2_on_e_fp12():
    x, y = bn254._untwist(bn254.G2_GEN)
    lhs = bn254.fp12_sq(y)
    rhs = bn254.fp12_add(
        bn254.fp12_mul(bn254.fp12_sq(x), x),
        (((3, 0), bn254.FP2_ZERO, bn254.FP2_ZERO), bn254.FP6_ZERO),
    )
    assert lhs == rhs


def test_pairing_bilinearity():
    e_ab = bn254.pairing(bn254.G2_GEN, bn254.G1_GEN)
    # e(2P, 3Q) == e(P, Q)^6
    p2 = bn254.g1_mul(bn254.G1_GEN, 2)
    q3 = bn254.g2_mul(bn254.G2_GEN, 3)
    assert bn254.pairing(q3, p2) == bn254.fp12_pow(e_ab, 6)


def test_pairing_nondegenerate():
    e = bn254.pairing(bn254.G2_GEN, bn254.G1_GEN)
    assert e != bn254.FP12_ONE
    assert bn254.fp12_pow(e, bn254.R) == bn254.FP12_ONE


# ---------------------------------------------------------------------------
# secp256k1 + ECDSA*
# ---------------------------------------------------------------------------


def test_secp_generator_order():
    assert secp256k1.is_on_curve(secp256k1.G)
    assert secp256k1.mul(secp256k1.G, secp256k1.N) is None


def test_ecdsa_sign_verify_star_roundtrip():
    pvt = 0xC0FFEE ^ 0xDEADBEEF12345678
    msghash = int.from_bytes(b"\x11" * 32, "big")
    pub = secp256k1.pubkey_from_private(pvt)
    r, s = secp256k1.ecdsa_sign(pvt, msghash, nonce=987654321987654321)
    assert secp256k1.ecdsa_verify(r, s, msghash, pub)
    star = secp256k1.ecdsa_star_from_ecdsa(r, s, msghash, pub)
    assert secp256k1.ecdsa_star_verify(star)
    # tampered r' must fail
    bad = star._replace(r_prime=(star.r_prime + 1) % secp256k1.P)
    assert not secp256k1.ecdsa_star_verify(bad)


def test_pubkey_recovery():
    pvt = 123456789123456789
    msghash = int.from_bytes(b"\x42" * 32, "big")
    pub = secp256k1.pubkey_from_private(pvt)
    r, s = secp256k1.ecdsa_sign(pvt, msghash, nonce=55555555555)
    for rec_id in range(2):
        try:
            recovered = secp256k1.recover_pubkey(r, s, msghash, rec_id)
        except ValueError:
            continue
        if recovered == pub:
            return
    pytest.fail("no recovery id reproduced the public key")


@pytest.mark.skipif(not has_reference(), reason="reference fixtures not mounted")
def test_golden_layer_one_input_is_valid_ecdsa_star():
    """The reference's golden layer-1 input registers must parse into a valid
    ECDSA* signature under our math (layout: 4x64-bit little-endian,
    reference scripts/input_prep_for_layer_one.ts:40-48)."""
    path = reference_path("tests", "1_sigs_1_batches_5_height", "layer_one_input.json")
    with open(path) as f:
        d = json.load(f)
    r = serde.from_limbs_64x4([int(x) for x in d["r"][0]])
    s = serde.from_limbs_64x4([int(x) for x in d["s"][0]])
    r_prime = serde.from_limbs_64x4([int(x) for x in d["rprime"][0]])
    msghash = serde.from_limbs_64x4([int(x) for x in d["msghash"][0]])
    pub = (
        serde.from_limbs_64x4([int(x) for x in d["pubkey"][0][0]]),
        serde.from_limbs_64x4([int(x) for x in d["pubkey"][0][1]]),
    )
    sig = secp256k1.EcdsaStarSignature(r=r, r_prime=r_prime, s=s, msghash=msghash, pubkey=pub)
    assert secp256k1.is_on_curve(pub)
    assert secp256k1.ecdsa_star_verify(sig)


# ---------------------------------------------------------------------------
# curve25519 Pedersen
# ---------------------------------------------------------------------------


def test_generators_on_curve():
    assert curve25519.is_on_curve(curve25519.GENERATOR_G)
    assert curve25519.is_on_curve(curve25519.GENERATOR_H)


def test_pedersen_homomorphic():
    c1 = curve25519.pedersen_commitment(100, 7)
    c2 = curve25519.pedersen_commitment(23, 5)
    c3 = curve25519.pedersen_commitment(123, 12)
    assert curve25519.point_equal(curve25519.point_add(c1, c2), c3)


def test_point_mul_matches_repeated_add():
    acc = curve25519.IDENTITY
    for _ in range(17):
        acc = curve25519.point_add(acc, curve25519.GENERATOR_G)
    assert curve25519.point_equal(acc, curve25519.point_mul(curve25519.GENERATOR_G, 17))


# ---------------------------------------------------------------------------
# serde
# ---------------------------------------------------------------------------


def test_limb_roundtrips():
    x = 0xDEADBEEFCAFEBABE1234567890ABCDEF0011223344556677
    for bits, k in ((64, 4), (43, 6), (85, 3)):
        assert serde.from_limbs(serde.to_limbs(x, bits, k), bits) == x


def test_tagged_json_roundtrip():
    obj = {"a": 2**200, "b": [1, 2, b"\x01\x02"], "c": "plain"}
    assert serde.loads_tagged(serde.dumps_tagged(obj)) == obj
