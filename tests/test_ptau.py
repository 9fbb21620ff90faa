"""Powers-of-tau ingestion (prover/ptau.py): the reference's
`snarkjs zkey new / contribute / beacon` path (g16_setup.sh:240-278).
A dev ceremony file is generated from seed toxic waste; setup_from_ptau
derives the circuit key WITHOUT access to tau, and proofs under the
resulting (contributed) key must verify."""

import os

import pytest

import tests.conftest as cft  # noqa: F401
from zkpoa_tpu.models.gadgets.poseidon_gadget import poseidon
from zkpoa_tpu.models.r1cs import Circuit
from zkpoa_tpu.prover import groth16, ptau
from zkpoa_tpu.prover.prove import prove


def _toy_circuit():
    c = Circuit()
    out = c.public_output()
    x = c.var(5)
    y = c.var(9)
    c.bind_output(out, poseidon(c, [x, y]))
    return c.compile()


@pytest.fixture(scope="module")
def dev_ptau(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ptau") / "dev_8.ptau")
    ptau.write_dev_ptau(path, power=8, seed="test-ceremony")
    return path


def test_ptau_roundtrip_and_pairing_consistency(dev_ptau):
    pt = ptau.read_ptau(dev_ptau)
    assert pt["power"] == 8
    assert len(pt["tau_g1"]) == 2 * 256 - 1
    assert len(pt["tau_g2"]) == 256
    assert ptau.verify_ptau(pt)


@pytest.mark.slow
def test_setup_from_ptau_prove_verify(dev_ptau):
    r1cs, wit = _toy_circuit()
    pk = ptau.setup_from_ptau(r1cs, dev_ptau)
    proof = prove(pk, r1cs, wit, seed="pt")
    vk = groth16.VerifyingKey.from_json(pk.vk_json)
    publics = [wit[w] for w in range(1, r1cs.n_public + 1)]
    assert groth16.verify(vk, proof, publics)


@pytest.mark.slow
def test_contribute_and_beacon(dev_ptau):
    r1cs, wit = _toy_circuit()
    pk = ptau.setup_from_ptau(r1cs, dev_ptau)
    pk2 = ptau.contribute(pk, "contributor-1 entropy")
    pk3 = ptau.beacon(pk2, "deadbeef", iterations=4)
    assert pk3.delta1 != pk.delta1  # delta actually moved
    proof = prove(pk3, r1cs, wit, seed="pt2")
    vk = groth16.VerifyingKey.from_json(pk3.vk_json)
    publics = [wit[w] for w in range(1, r1cs.n_public + 1)]
    assert groth16.verify(vk, proof, publics)
    # old-key proofs must NOT verify under the contributed vk
    proof_old = prove(pk, r1cs, wit, seed="pt2")
    assert not groth16.verify(vk, proof_old, publics)
