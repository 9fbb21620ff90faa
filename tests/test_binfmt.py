"""iden3 binary container interop (.r1cs / .wtns / .zkey).

These formats are the artifact boundary of the reference toolchain (circom
--r1cs, witness .wtns at scripts/g16_prove.sh:229-239, snarkjs/rapidsnark
.zkey at scripts/g16_setup.sh:240-253). Round-trip every format, then prove
on the TPU path from a *re-imported* zkey + wtns only — the "foreign
artifact" flow a rapidsnark user exercises."""

import os

from zkpoa_tpu.models.r1cs import Circuit
from zkpoa_tpu.prover import groth16
from zkpoa_tpu.prover.prove import prove
from zkpoa_tpu.prover.setup import setup
from zkpoa_tpu.utils import binfmt


def _circuit(x=9, y=4):
    c = Circuit()
    out = c.public_output()
    x_s = c.var(x)
    y_s = c.var(y)
    prod = c.mul(x_s, y_s)
    sq = c.mul(prod, prod)
    c.bind_output(out, sq + x_s + 3)
    return c


def test_wtns_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "w.wtns")
    wit = [1, 2**200 + 17, 0, 12345]
    binfmt.write_wtns(path, wit)
    assert binfmt.read_wtns(path) == wit


def test_r1cs_roundtrip(tmp_path):
    c = _circuit()
    r1cs, wit = c.compile()
    path = os.path.join(tmp_path, "c.r1cs")
    binfmt.write_r1cs(path, r1cs)
    back = binfmt.read_r1cs(path)
    assert back.n_wires == r1cs.n_wires
    assert back.n_public == r1cs.n_public
    assert back.n_constraints == r1cs.n_constraints
    assert sorted(back.a_rows) == sorted((i, w, v % binfmt.bn254.R) for i, w, v in r1cs.a_rows)
    assert back.is_satisfied(wit)
    wit_bad = list(wit)
    wit_bad[1] += 1
    assert not back.is_satisfied(wit_bad)


def test_zkey_roundtrip_and_prove_from_imported_artifacts(tmp_path):
    c = _circuit(5, 8)
    r1cs, wit = c.compile()
    pk = setup(r1cs, seed="binfmt")

    zkey_path = os.path.join(tmp_path, "c.zkey")
    wtns_path = os.path.join(tmp_path, "c.wtns")
    binfmt.write_zkey(zkey_path, pk, r1cs)
    binfmt.write_wtns(wtns_path, wit)

    pk2, coeffs = binfmt.read_zkey(zkey_path)
    assert pk2.n_vars == pk.n_vars
    assert pk2.n_public == pk.n_public
    assert pk2.domain_size == pk.domain_size
    assert pk2.a_query == pk.a_query
    assert pk2.b1_query == pk.b1_query
    assert pk2.b2_query == pk.b2_query
    assert pk2.c_query == pk.c_query
    assert pk2.h_query == pk.h_query
    assert pk2.alpha1 == pk.alpha1

    # prove using ONLY the imported zkey + wtns (A/B rows reconstructed from
    # section 4; C evaluations derived pointwise) and verify under the
    # original vkey.
    r1cs2 = binfmt.r1cs_from_zkey_coeffs(
        coeffs, pk2.n_vars, pk2.n_public, r1cs.n_constraints
    )
    wit2 = binfmt.read_wtns(wtns_path)
    proof = prove(pk2, r1cs2, wit2, seed="imported")
    vk = groth16.VerifyingKey.from_json(pk.vk_json)
    assert groth16.verify(vk, proof, c.public_values)
    assert not groth16.verify(vk, proof, [c.public_values[0] + 1])


def test_coset_h_basis_prove_and_zkey_roundtrip(tmp_path):
    """snarkjs section-9 convention: the prover MSMs coset evaluations of
    A*B-C against coset-Lagrange H points (what rapidsnark does with a
    snarkjs zkey), instead of h coefficients against the monomial basis.
    Both setups must yield verifying proofs for the same circuit, and the
    coset zkey must survive a file round-trip with h_basis='coset'."""
    c = _circuit(6, 7)
    r1cs, wit = c.compile()
    pk_cs = setup(r1cs, seed="binfmt-coset", h_basis="coset")
    assert pk_cs.h_basis == "coset"
    assert len(pk_cs.h_query) == pk_cs.domain_size

    proof = prove(pk_cs, r1cs, wit, seed="cs1")
    vk = groth16.VerifyingKey.from_json(pk_cs.vk_json)
    assert groth16.verify(vk, proof, c.public_values)
    assert not groth16.verify(vk, proof, [c.public_values[0] + 1])

    # same trusted-setup seed in monomial basis proves the same statement
    pk_mono = setup(r1cs, seed="binfmt-coset", h_basis="monomial")
    proof_m = prove(pk_mono, r1cs, wit, seed="cs1")
    vk_m = groth16.VerifyingKey.from_json(pk_mono.vk_json)
    assert vk_m.to_json() == vk.to_json()  # CRS identical outside section 9
    assert groth16.verify(vk, proof_m, c.public_values)
    # same (tau, r, s): identical proof points from either H basis
    assert proof_m.pi_a == proof.pi_a
    assert proof_m.pi_c == proof.pi_c

    # zkey file round-trip in the foreign (snarkjs) convention
    zkey_path = os.path.join(tmp_path, "coset.zkey")
    binfmt.write_zkey(zkey_path, pk_cs, r1cs)
    pk2, coeffs = binfmt.read_zkey(zkey_path, h_basis="coset")
    assert pk2.h_basis == "coset"
    assert pk2.h_query == pk_cs.h_query
    r1cs2 = binfmt.r1cs_from_zkey_coeffs(
        coeffs, pk2.n_vars, pk2.n_public, r1cs.n_constraints
    )
    proof2 = prove(pk2, r1cs2, wit, seed="cs2")
    assert groth16.verify(vk, proof2, c.public_values)


def test_zkey_h_basis_auto_detection(tmp_path):
    """h_basis='auto' distinguishes natively-written monomial zkeys (section
    9 padded with a tail infinity point) from coset zkeys (all finite), and
    a coset read of a monomial file raises instead of misinterpreting."""
    import pytest

    c = _circuit(6, 7)
    r1cs, wit = c.compile()
    pk_m = setup(r1cs, seed="auto-detect", h_basis="monomial")
    pk_c = setup(r1cs, seed="auto-detect", h_basis="coset")
    p_m = os.path.join(tmp_path, "m.zkey")
    p_c = os.path.join(tmp_path, "c.zkey")
    binfmt.write_zkey(p_m, pk_m, r1cs)
    binfmt.write_zkey(p_c, pk_c, r1cs)

    pk_m2, _ = binfmt.read_zkey(p_m, h_basis="auto")
    assert pk_m2.h_basis == "monomial"
    assert pk_m2.h_query == pk_m.h_query
    pk_c2, _ = binfmt.read_zkey(p_c, h_basis="auto")
    assert pk_c2.h_basis == "coset"
    assert pk_c2.h_query == pk_c.h_query
    with pytest.raises(ValueError):
        binfmt.read_zkey(p_m, h_basis="coset")
