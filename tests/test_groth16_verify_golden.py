"""Bit-exactness referee test: our host Groth16 verifier must accept the
reference's golden proofs against the reference's golden vkeys, and reject
tampered ones. This pins our BN254 pairing to snarkjs semantics."""

import json

import pytest

from tests.conftest import has_reference, reference_path
from zkpoa_tpu.prover import groth16

GOLDEN = "tests/4_sigs_2_batches_12_height"

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference fixtures not mounted")


def _load(layer: str, batch: str | None):
    vkey = reference_path(GOLDEN, layer, f"{layer.split('/')[-1]}_vkey.json")
    base = reference_path(GOLDEN, layer, batch) if batch else reference_path(GOLDEN, layer)
    with open(vkey) as f:
        vk = groth16.VerifyingKey.from_json(json.load(f))
    with open(f"{base}/proof.json") as f:
        proof = groth16.Proof.from_json(json.load(f))
    with open(f"{base}/public.json") as f:
        publics = [int(x) for x in json.load(f)]
    return vk, proof, publics


def test_golden_layer_one_batch0_verifies():
    vk, proof, publics = _load("layer_one", "batch_0")
    assert groth16.verify(vk, proof, publics)


def test_golden_layer_one_batch1_verifies():
    vk, proof, publics = _load("layer_one", "batch_1")
    assert groth16.verify(vk, proof, publics)


def test_golden_layer_two_batch0_verifies():
    vk, proof, publics = _load("layer_two", "batch_0")
    assert groth16.verify(vk, proof, publics)


def test_golden_layer_three_verifies():
    vk, proof, publics = _load("layer_three", None)
    assert groth16.verify(vk, proof, publics)


def test_tampered_public_input_rejected():
    vk, proof, publics = _load("layer_one", "batch_0")
    publics = [publics[0] + 1] + publics[1:]
    assert not groth16.verify(vk, proof, publics)


def test_tampered_proof_rejected():
    vk, proof, publics = _load("layer_one", "batch_0")
    import zkpoa_tpu.fields.bn254 as bn254

    proof.pi_c = bn254.g1_add(proof.pi_c, bn254.G1_GEN)
    assert not groth16.verify(vk, proof, publics)
