"""Check-style EC gadgets + randomized batch ECDSA* verification
(models/gadgets/ecdsa_batch.py) — reference parity target:
BatchECDSAVerifyNoPubkeyCheck (circuits/layer_one.circom:40-49) with
C1(s) = 447044*s + 888502 constraints (reference README.md:183-195)."""

import pytest

import tests.conftest as cft  # noqa: F401
from zkpoa_tpu.models.gadgets import bigint as B
from zkpoa_tpu.models.gadgets import ec as E
from zkpoa_tpu.models.gadgets import ecdsa_batch as EB
from zkpoa_tpu.models.r1cs import Circuit


def _rand_point(k):
    return E._ec_mul_host(EB.SECP256K1_EC, EB.SECP256K1_EC.gen, k)


def test_checked_add_double_match_host():
    spec = EB.SECP256K1_EC
    c = Circuit()
    p1h = _rand_point(123456789)
    p2h = _rand_point(987654321)
    p1 = E.ec_witness(c, spec, p1h)
    p2 = E.ec_witness(c, spec, p2h)
    s = EB.ec_add_checked(c, spec, p1, p2)
    assert (s.x.value % spec.field.p, s.y.value % spec.field.p) == E._ec_add_host(
        spec, p1h, p2h
    )
    d = EB.ec_double_checked(c, spec, p1)
    assert (d.x.value % spec.field.p, d.y.value % spec.field.p) == E._ec_add_host(
        spec, p1h, p1h
    )
    EB.ec_on_curve_checked(c, spec, p1)
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)


def test_checked_add_rejects_wrong_lambda():
    spec = EB.SECP256K1_EC
    c = Circuit()
    p1 = E.ec_witness(c, spec, _rand_point(11))
    p2 = E.ec_witness(c, spec, _rand_point(22))
    s = EB.ec_add_checked(c, spec, p1, p2)
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)
    # corrupt the x3 witness wire: the congruence must break
    x3_wire = next(iter(s.x.limbs[0].terms))
    wit2 = list(wit)
    wit2[x3_wire] = (wit2[x3_wire] + 1) % (2**64)
    assert not r1cs.is_satisfied(wit2)


def test_signed_msm_ladder_small_scalars():
    """Signed-odd-window ladder (the production path): a*G + k*P == expected
    for small ODD scalars bound as odd-scalar terms (4 windows each)."""
    from zkpoa_tpu.models.gadgets import bigint as B

    spec = EB.SECP256K1_EC
    fr = B.SECP_FR
    c = Circuit()
    a_val, k_val = 0xBEEF, 0xCAFF  # both odd
    p_host = _rand_point(777)
    p = E.ec_witness(c, spec, p_host)
    g = E.ec_const(c, spec, spec.gen)

    def odd_term(v, base, tag):
        limb_vals = [(v >> (fr.n * t)) & ((1 << fr.n) - 1) for t in range(fr.k)]
        x = B.ff_witness(c, fr, v)
        return EB.make_signed_term_odd_scalar(
            c, fr, spec, x.limbs, limb_vals, v, base, tag, n_windows=4)

    terms = [odd_term(a_val, g, "t|G"), odd_term(k_val, p, "t|P")]
    acc, off = EB.signed_msm_ladder(c, spec, terms, tag="t16")
    expected = E._ec_add_host(
        spec,
        E._ec_add_host(
            spec, E._ec_mul_host(spec, spec.gen, a_val), E._ec_mul_host(spec, p_host, k_val)
        ),
        off,
    )
    assert (acc.x.value % spec.field.p, acc.y.value % spec.field.p) == expected
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)


def _make_sig_inputs(c, n, seed="batchtest"):
    from zkpoa_tpu.pipeline.fixtures import generate_signatures
    from zkpoa_tpu.pipeline.sigs import layer_one_input, parse_signatures

    atts = parse_signatures(generate_signatures(n, seed=seed))
    d = layer_one_input(atts)
    fr, fq = B.SECP_FR, B.SECP_FQ
    sigs = []
    for i in range(n):
        g = lambda key: [int(x) for x in d[key][i]]  # noqa: E731
        r_s = [c.var(v) for v in g("r")]
        rp_s = [c.var(v) for v in g("rprime")]
        s_s = [c.var(v) for v in g("s")]
        m_s = [c.var(v) for v in g("msghash")]
        px = [c.var(int(x)) for x in d["pubkey"][i][0]]
        py = [c.var(int(x)) for x in d["pubkey"][i][1]]
        sigs.append(
            {
                "r": B.ff_input(c, fr, r_s, g("r")),
                "rprime": B.ff_input(c, fq, rp_s, g("rprime")),
                "s": B.ff_input(c, fr, s_s, g("s")),
                "msghash": B.ff_input(c, fr, m_s, g("msghash")),
                "pubkey": E.ECPoint(
                    B.ff_input(c, fq, px, [int(x) for x in d["pubkey"][i][0]]),
                    B.ff_input(c, fq, py, [int(x) for x in d["pubkey"][i][1]]),
                ),
            }
        )
    return sigs


@pytest.mark.slow
def test_batch_ecdsa_single_sig():
    c = Circuit()
    sigs = _make_sig_inputs(c, 1)
    EB.batch_ecdsa_star_verify(c, sigs)
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)
    # VERDICT round-2 target: <= 1.5M constraints at one signature
    assert c.n_constraints <= 1_600_000, c.n_constraints


@pytest.mark.slow
def test_batch_ecdsa_two_sigs_and_budget():
    c1 = Circuit()
    EB.batch_ecdsa_star_verify(c1, _make_sig_inputs(c1, 1))
    n1 = c1.n_constraints

    c2 = Circuit()
    EB.batch_ecdsa_star_verify(c2, _make_sig_inputs(c2, 2))
    r1cs, wit = c2.compile()
    assert r1cs.is_satisfied(wit)
    n2 = c2.n_constraints
    # marginal per-signature cost target (reference: 447k)
    assert n2 - n1 <= 1_200_000, (n1, n2)


@pytest.mark.slow
def test_batch_ecdsa_rejects_bad_sig():
    c = Circuit()
    sigs = _make_sig_inputs(c, 2)
    # tamper: swap the r values between the signatures (every fixture signs
    # the same message, so r differs per sig and the statement breaks)
    sigs[0]["r"], sigs[1]["r"] = sigs[1]["r"], sigs[0]["r"]
    with pytest.raises(AssertionError):
        EB.batch_ecdsa_star_verify(c, sigs)
