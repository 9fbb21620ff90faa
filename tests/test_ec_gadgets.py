"""Foreign-field bigint + EC gadget tests: constraint satisfaction, witness
correctness vs exact host math, and tamper rejection. Mini ladders keep the
fast path small; the full 256-bit ECDSA* verify runs as a slow test."""

import pytest

import tests.conftest as cft  # noqa: F401  (forces CPU/jax config)
from zkpoa_tpu.fields import secp256k1 as S
from zkpoa_tpu.models.gadgets import bigint as B
from zkpoa_tpu.models.gadgets import ec as E
from zkpoa_tpu.models.r1cs import Circuit


def test_ff_mul_random():
    c = Circuit()
    spec = B.SECP_FQ
    import random

    rng = random.Random(1)
    for _ in range(3):
        a = rng.randrange(spec.p)
        b = rng.randrange(spec.p)
        fa = B.ff_witness(c, spec, a)
        fb = B.ff_witness(c, spec, b)
        r = B.ff_mul(c, fa, fb)
        assert r.value == a * b % spec.p
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)


def test_ff_add_sub_inv_div():
    c = Circuit()
    spec = B.SECP_FQ
    a, b = 0xDEADBEEF << 200, 0x1234567890ABCDEF
    fa = B.ff_witness(c, spec, a)
    fb = B.ff_witness(c, spec, b)
    assert B.ff_add(c, fa, fb).value == (a + b) % spec.p
    assert B.ff_sub(c, fb, fa).value == (b - a) % spec.p
    assert B.ff_inv(c, fa).value == pow(a, -1, spec.p)
    assert B.ff_div(c, fa, fb).value == a * pow(b, -1, spec.p) % spec.p
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)


def test_ff_mul_tamper_rejected():
    spec = B.SECP_FQ
    c = Circuit()
    fa = B.ff_witness(c, spec, 12345)
    fb = B.ff_witness(c, spec, 67890)
    r = B.ff_mul(c, fa, fb)
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)
    # corrupt the product's first limb
    bad = list(wit)
    bad[r.limbs[0].wire] = (bad[r.limbs[0].wire] + 1) % (1 << 64)
    assert not r1cs.is_satisfied(bad)


def test_ec_add_double_match_host():
    c = Circuit()
    spec = E.SECP256K1_EC
    p1 = S.mul(S.G, 7)
    p2 = S.mul(S.G, 11)
    e1 = E.ec_witness(c, spec, p1)
    e2 = E.ec_witness(c, spec, p2)
    s_add = E.ec_add_unequal(c, spec, e1, e2)
    assert s_add.value == S.add(p1, p2)
    s_dbl = E.ec_double(c, spec, e1)
    assert s_dbl.value == S.mul(S.G, 14)
    E.ec_on_curve(c, spec, s_add)
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)


def test_shamir_mini_ladder():
    """8-bit scalars: k1*G + k2*P against host arithmetic."""
    c = Circuit()
    spec = E.SECP256K1_EC
    k1, k2 = 0b10110101, 0b01101110
    pub = S.mul(S.G, 999)
    e_pub = E.ec_witness(c, spec, pub)
    bits1 = [c.var((k1 >> i) & 1) for i in range(8)]
    bits2 = [c.var((k2 >> i) & 1) for i in range(8)]
    for bb in bits1 + bits2:
        c.constrain(bb, bb - 1, 0)
    res = E.shamir_double_mul(c, spec, bits1, S.G, bits2, e_pub, tag="mini")
    expected = S.add(S.mul(S.G, k1), S.mul(pub, k2))
    assert res.value == expected
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)


@pytest.mark.slow
def test_ecdsa_star_verify_full():
    """Full 256-bit in-circuit ECDSA* verification of a real signature."""
    pvt = 0xC0FFEE0DDF00D
    pub = S.pubkey_from_private(pvt)
    msghash = 0x1122334455667788990011223344556677889900112233445566778899001122
    r, s = S.ecdsa_sign(pvt, msghash, nonce=0x5EED)
    star = S.ecdsa_star_from_ecdsa(r, s, msghash, pub)
    assert S.ecdsa_star_verify(star)

    c = Circuit(check=False)
    fr, fq = B.SECP_FR, B.SECP_FQ
    f_r = B.ff_witness(c, fr, star.r)
    f_rp = B.ff_witness(c, fq, star.r_prime)
    f_s = B.ff_witness(c, fr, star.s)
    f_m = B.ff_witness(c, fr, star.msghash)
    e_pub = E.ec_witness(c, E.SECP256K1_EC, pub)
    E.ecdsa_star_verify(c, f_r, f_rp, f_s, f_m, e_pub)
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)


def test_ff_assert_canonical_boundary_and_soundness():
    """Canonicity gadget (the chord add's cheap dx != 0 precondition):
    satisfiable at the boundary value p-1; a consistently-forged
    witness for value+p (representable when value < 2^256 - p) violates
    the constraint system."""
    fq = B.SECP_FQ
    p = fq.p
    c = Circuit()
    a = B.ff_witness(c, fq, p - 1)
    B.ff_assert_canonical(c, a)
    r1, w = c.compile()
    assert r1.is_satisfied(w)

    # soundness: re-derive a FULLY consistent witness for the
    # non-canonical representation value+p of a tiny value (fits in
    # 256 bits), by rebuilding the same circuit shape with raw limbs
    # and swapping the recorded bit/limb values
    tiny = 5
    forged = tiny + p
    c2 = Circuit(check=False)
    limbs = fq.to_limbs(tiny)
    forged_limbs = [(forged >> (fq.n * i)) & ((1 << fq.n) - 1)
                    for i in range(fq.k)]
    a2 = B.ff_witness(c2, fq, tiny)
    B.ff_assert_canonical(c2, a2)
    r2, w2 = c2.compile()
    assert r2.is_satisfied(w2)
    # brute-force forge: walk every witness index; flipping the honest
    # decomposition of `tiny` to that of `forged` must make SOME
    # constraint fail no matter how the auxiliary wires are chosen —
    # approximate by swapping limb+bit wires consistently
    w3 = list(w2)
    changed = False
    for i, (hv, fv) in enumerate(zip(limbs, forged_limbs)):
        if hv == fv:
            continue
        # find the limb wire holding hv and its bit wires after it
        for wi, val in enumerate(w3):
            if val == hv:
                w3[wi] = fv
                for b in range(fq.n):
                    w3[wi + 1 + b] = (fv >> b) & 1
                changed = True
                break
    assert changed
    assert not r2.is_satisfied(w3)


def test_ff_assert_limbs_differ():
    fq = B.SECP_FQ
    c = Circuit()
    a = B.ff_witness(c, fq, 1234)
    b = B.ff_witness(c, fq, 5678)
    B.ff_assert_limbs_differ(c, a, b)
    r1, w = c.compile()
    assert r1.is_satisfied(w)

    # equal values: the is_zero product becomes 1 and the assert fails
    # at witness generation (check mode) or at satisfaction
    c2 = Circuit(check=False)
    a2 = B.ff_witness(c2, fq, 999)
    b2 = B.ff_witness(c2, fq, 999)
    B.ff_assert_limbs_differ(c2, a2, b2)
    r2, w2 = c2.compile()
    assert not r2.is_satisfied(w2)
