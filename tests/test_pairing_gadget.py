"""In-snark Groth16 verification: host residue-witness machinery, the
lazy-reduction foreign-field engine, Fq12 gadget ops, and the full
verifier gadget against a golden reference proof.

Parity target: the reference's circom-pairing verifyProof consumed by
circuits/layer_two.circom:29-49 / layer_three.circom:41-48 (~19.5M
constraints). Ours verifies the same sanitized-proof register format in
~7.0M constraints (residue-witness final-exp elimination + constant-vkey
precomputed lines + direct Fp12 basis with per-output lazy reduction).
"""

import json
import os
import random

import pytest

from zkpoa_tpu.fields import bn254 as bn
from zkpoa_tpu.fields import bn254_direct as bd
from zkpoa_tpu.models.gadgets import ffdot as FF
from zkpoa_tpu.models.gadgets import fp12_gadget as F12
from zkpoa_tpu.models.gadgets import pairing_gadget as PG
from zkpoa_tpu.models.r1cs import Circuit

from conftest import has_reference, reference_path

GOLDEN = "tests/1_sigs_1_batches_5_height/layer_one/batch_0/sanitized_proof.json"

SPEC = FF.DotSpec(bn.P, 86, 3, "fq")


# ---------------------------------------------------------------------------
# host machinery
# ---------------------------------------------------------------------------


def test_direct_basis_roundtrip_and_mul():
    rng = random.Random(11)
    a = tuple(rng.randrange(bn.P) for _ in range(12))
    at = bd.direct_to_tower(a)
    assert bd.tower_to_direct(at) == a
    b = tuple(rng.randrange(bn.P) for _ in range(12))
    ab = bd.direct_mul(a, b)
    assert ab == bd.tower_to_direct(bn.fp12_mul(at, bd.direct_to_tower(b)))


def test_affine_miller_matches_pairing():
    q = bn.g2_mul(bn.G2_GEN, 123456789)
    p = bn.g1_mul(bn.G1_GEN, 987654321)
    f = bd.multi_miller_affine([(q, p)])
    assert bn.final_exponentiate(f) == bn.pairing(q, p)


def test_residue_witness_roundtrip():
    q = bn.g2_mul(bn.G2_GEN, 31337)
    p = bn.g1_mul(bn.G1_GEN, 271828)
    f = bd.multi_miller_affine([(q, p), (q, bn.g1_neg(p))])
    assert bn.final_exponentiate(f) == bn.FP12_ONE
    c, u_idx = bd.residue_witness(f)
    lhs = bn.fp12_mul(f, bd.w27_powers()[u_idx])
    assert lhs == bn.fp12_pow(c, bd.LAMBDA)
    # an F that fails the pairing check has no witness
    with pytest.raises(ValueError):
        bd.residue_witness(bn.fp12_mul(f, bd.multi_miller_affine([(q, p)])))


def test_prefe_representative():
    z = bn.pairing(bn.g2_mul(bn.G2_GEN, 7), bn.g1_mul(bn.G1_GEN, 13))
    assert bn.final_exponentiate(bd.prefe_representative(z)) == z


# ---------------------------------------------------------------------------
# ffdot engine
# ---------------------------------------------------------------------------


def test_ffdot_mul_dot_inv():
    rng = random.Random(5)
    c = Circuit(check=True)
    av, bv = rng.randrange(bn.P), rng.randrange(bn.P)
    a = FF.fe_witness(c, SPEC, av)
    b = FF.fe_witness(c, SPEC, bv)
    r = FF.fe_mul(c, a, b)
    assert r.value_mod_p == av * bv % bn.P
    d = FF.reduce_to_fe(
        c,
        SPEC,
        [(3, FF.conv_mul(c, a, b)), (-7, FF.conv_lin(a)), (1, FF.conv_const(b, 999))],
        const=-5,
    )
    assert d.value_mod_p == (3 * av * bv - 7 * av + 999 * bv - 5) % bn.P
    inv = FF.fe_inv_witness(c, a)
    assert inv.value_mod_p == pow(av, -1, bn.P)
    lin = FF.fe_lin(SPEC, [(1, a), (-9, b)], const=4)
    assert FF.fe_mul(c, lin, b).value_mod_p == (av - 9 * bv + 4) * bv % bn.P
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)


def test_ffdot_reduce_zero_rejects_bad_witness():
    c = Circuit(check=True)
    a = FF.fe_witness(c, SPEC, 17)
    FF.fe_assert_value(c, a, 17)
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)
    # corrupting the limb witness breaks a constraint
    bad = list(wit)
    bad[a.limbs[0].__iter__().__next__()] = 18
    assert not r1cs.is_satisfied(bad)


# ---------------------------------------------------------------------------
# fq12 gadget ops vs host values
# ---------------------------------------------------------------------------


def test_fq12_ops_match_host():
    rng = random.Random(7)
    a_d = tuple(rng.randrange(bn.P) for _ in range(12))
    b_d = tuple(rng.randrange(bn.P) for _ in range(12))
    c = Circuit(check=False)
    A = F12.fq12_witness(c, a_d)
    B = F12.fq12_witness(c, b_d)
    assert F12.fq12_mul(c, A, B).direct_value == bd.direct_mul(a_d, b_d)
    assert F12.fq12_sq(c, A).direct_value == bd.direct_mul(a_d, a_d)
    assert F12.fq12_mul_const(c, A, b_d).direct_value == bd.direct_mul(a_d, b_d)
    at = bd.direct_to_tower(a_d)
    for p in (1, 2, 3):
        x = at
        for _ in range(p):
            x = bn.fp12_frobenius(x)
        assert F12.fq12_frobenius(c, A, p).direct_value == bd.tower_to_direct(x)
    # line-sparse product
    q = bn.g2_mul(bn.G2_GEN, 777)
    pt = bn.g1_mul(bn.G1_GEN, 888)
    cw, cw3 = bd.precompute_g2_lines(q)[0]
    y_inv = pow(pt[1], -1, bn.P)
    s1v = -pt[0] * y_inv % bn.P
    s1 = FF.fe_witness(c, F12.FQ, s1v)
    s2 = FF.fe_witness(c, F12.FQ, y_inv)
    ds = F12.line_coeffs_const(c, s1, s2, cw, cw3)
    got = F12.fq12_mul_line_var(c, A, *ds).direct_value
    want = bd.tower_to_direct(bn.fp12_mul(at, bd.line_value((cw, cw3), s1v, y_inv)))
    assert got == want
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)


# ---------------------------------------------------------------------------
# the full verifier gadget on a golden reference proof
# ---------------------------------------------------------------------------


def _load_golden():
    with open(reference_path(GOLDEN)) as f:
        return json.load(f)


def _point_signals(c, regs2):
    return tuple(
        PG.fe_from_regs43(c, [c.var(int(x)) for x in regs2[i]], [int(x) for x in regs2[i]])
        for i in (0, 1)
    )


@pytest.mark.slow
@pytest.mark.skipif(not has_reference(), reason="reference artifacts not mounted")
def test_groth16_verify_gadget_golden_layer_one_proof():
    d = _load_golden()
    pvk = PG.PreparedVK.from_sanitized(d)
    c = Circuit(check=False)
    negpa = _point_signals(c, d["negpa"])
    pb = (_point_signals(c, d["pb"][0]), _point_signals(c, d["pb"][1]))
    pc = _point_signals(c, d["pc"])
    pub = [c.var(int(d["pubInput"][0]))]
    PG.groth16_verify_gadget(c, pvk, negpa, pb, pc, pub)
    assert c.n_constraints < 8_000_000  # reference: ~19.5M for the same op
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)


@pytest.mark.slow
def test_layer_three_verifies_own_inner_proof():
    """End-to-end recursion wiring: a proof produced by OUR prover, with
    the layer-2 public shape [balance, root], verified in-snark inside
    layer_three_circuit (the reference's verifyProof loop,
    circuits/layer_three.circom:41-48)."""
    from zkpoa_tpu.models.layers import layer_three_circuit
    from zkpoa_tpu.pipeline.sanitize import sanitize
    from zkpoa_tpu.prover import groth16
    from zkpoa_tpu.prover.prove import prove
    from zkpoa_tpu.prover.setup import setup

    balance, root = 4242, 987654321
    inner = Circuit()
    out = inner.public_output()
    root_sig = inner.public(root)
    a = inner.var(4000)
    b = inner.var(242)
    inner.constrain(a, b, inner.var(4000 * 242))
    inner.bind_output(out, a + b)
    inner.assert_equal(root_sig, root)
    r1, w1 = inner.compile()
    pk = setup(r1, seed="recursion-test")
    proof = prove(pk, r1, w1, seed="inner")
    vk = groth16.VerifyingKey.from_json(pk.vk_json)
    assert groth16.verify(vk, proof, inner.public_values)
    san = sanitize(vk, proof, inner.public_values)
    pvk = PG.PreparedVK.from_vk(vk)

    c3 = layer_three_circuit([balance], root, blinding_factor=777, inner=[(pvk, san)])
    r3, w3 = c3.compile()
    assert r3.is_satisfied(w3)
    # wrong balance must fail at witness generation (no residue witness)
    with pytest.raises(ValueError):
        layer_three_circuit([balance + 1], root, blinding_factor=777, inner=[(pvk, san)])


@pytest.mark.slow
def test_layer_three_verifies_two_inner_proofs():
    """The layer-3 MULTI-proof aggregation loop (the reference's flagship
    2-batch shape, circuits/layer_three.circom:41-48 +
    tests/4_sigs_2_batches_12_height.sh): two distinct inner proofs with
    distinct balances, both verified in-snark against [balance_b, root],
    summed into one Pedersen commitment — and a tampered balance on
    EITHER side must fail witness generation."""
    from zkpoa_tpu.models.layers import layer_three_circuit
    from zkpoa_tpu.pipeline.sanitize import sanitize
    from zkpoa_tpu.prover import groth16
    from zkpoa_tpu.prover.prove import prove
    from zkpoa_tpu.prover.setup import setup

    root = 987654321
    balances = [4242, 1337]

    def build_inner(balance):
        # same structure for both balances (production batches share one
        # zkey): balance = a + 242 with a = balance - 242
        inner = Circuit()
        out = inner.public_output()
        root_sig = inner.public(root)
        a = inner.var(balance - 242)
        b = inner.var(242)
        inner.constrain(a, b, inner.var((balance - 242) * 242))
        inner.bind_output(out, a + b)
        inner.assert_equal(root_sig, root)
        return inner

    sans, pvks = [], []
    pk = None
    for i, bal in enumerate(balances):
        inner = build_inner(bal)
        r1, w1 = inner.compile()
        if pk is None:
            pk = setup(r1, seed="recursion-test-2")
        proof = prove(pk, r1, w1, seed=f"inner-{i}")
        vk = groth16.VerifyingKey.from_json(pk.vk_json)
        assert inner.public_values[0] == bal
        assert groth16.verify(vk, proof, inner.public_values)
        sans.append(sanitize(vk, proof, inner.public_values))
        pvks.append(PG.PreparedVK.from_vk(vk))

    c3 = layer_three_circuit(balances, root, blinding_factor=777,
                             inner=list(zip(pvks, sans)))
    r3, w3 = c3.compile()
    assert r3.is_satisfied(w3)

    # tampering either batch's balance must fail witness generation
    # (no residue witness exists for the mismatched public pair)
    with pytest.raises(ValueError):
        layer_three_circuit([balances[0] + 1, balances[1]], root,
                            blinding_factor=777,
                            inner=list(zip(pvks, sans)))
    with pytest.raises(ValueError):
        layer_three_circuit([balances[0], balances[1] - 1], root,
                            blinding_factor=777,
                            inner=list(zip(pvks, sans)))
    # swapping the two proofs swaps the balance binding: must also fail
    with pytest.raises(ValueError):
        layer_three_circuit(balances, root, blinding_factor=777,
                            inner=[(pvks[1], sans[1]), (pvks[0], sans[0])])


@pytest.mark.skipif(not has_reference(), reason="reference artifacts not mounted")
def test_groth16_verify_gadget_rejects_tampered_public():
    d = _load_golden()
    pvk = PG.PreparedVK.from_sanitized(d)
    c = Circuit(check=False)
    negpa = _point_signals(c, d["negpa"])
    pb = (_point_signals(c, d["pb"][0]), _point_signals(c, d["pb"][1]))
    pc = _point_signals(c, d["pc"])
    pub = [c.var(int(d["pubInput"][0]) + 1)]
    with pytest.raises(ValueError):
        PG.groth16_verify_gadget(c, pvk, negpa, pb, pc, pub)


@pytest.mark.slow
def test_prove_and_verify_circuit_with_fq12_gadget():
    """Prove-level coverage of the recursion substrate: a Groth16 proof of
    a circuit built from the SAME foreign-field/Fq12 gadget machinery the
    in-snark verifier uses (fq12_mul + fq12_sq over FFdot congruences),
    verified by the host verifier and tamper-rejected. (The full ~7M-
    constraint verifier gadget proves on hardware — experiments/
    run_recursive.py; this keeps the prove path over gadget-style
    constraints covered off-hardware.)"""
    from zkpoa_tpu.prover import groth16
    from zkpoa_tpu.prover.prove import prove
    from zkpoa_tpu.prover.setup import setup

    rng = random.Random(11)
    a_d = tuple(rng.randrange(bn.P) for _ in range(12))
    b_d = tuple(rng.randrange(bn.P) for _ in range(12))
    c = Circuit(check=False)
    out = c.public_output()
    A = F12.fq12_witness(c, a_d)
    B = F12.fq12_witness(c, b_d)
    AB = F12.fq12_mul(c, A, B)
    AB2 = F12.fq12_sq(c, AB)
    # bind one limb of the result into the public output (FE limbs are
    # {wire: coeff} dicts over the native field)
    from zkpoa_tpu.models.r1cs import LC

    c.bind_output(out, LC(dict(AB2.co[0].limbs[0])))
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)

    pk = setup(r1cs, seed="fq12-prove-test")
    proof = prove(pk, r1cs, wit, seed="fq12")
    vk = groth16.VerifyingKey.from_json(pk.vk_json)
    assert groth16.verify(vk, proof, c.public_values)
    # tampered public input must not verify
    assert not groth16.verify(vk, proof, [(c.public_values[0] + 1) % bn.R])
