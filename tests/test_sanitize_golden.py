"""Recursion-glue bit-exactness: our sanitization (including the e(-alpha,
beta) pairing computed by OUR Fp12 tower) must reproduce the reference's
golden sanitized_proof.json byte for byte."""

import json

import pytest

import tests.conftest as cft
from zkpoa_tpu.pipeline.sanitize import sanitize
from zkpoa_tpu.prover.groth16 import Proof, VerifyingKey

pytestmark = pytest.mark.skipif(not cft.has_reference(), reason="reference fixtures not mounted")

G = "tests/4_sigs_2_batches_12_height"


@pytest.mark.parametrize("layer,batch", [("layer_one", "batch_0"), ("layer_one", "batch_1"), ("layer_two", "batch_0"), ("layer_two", "batch_1")])
def test_sanitized_proof_bit_exact(layer, batch):
    with open(cft.reference_path(G, layer, f"{layer}_vkey.json")) as f:
        vk = VerifyingKey.from_json(json.load(f))
    base = cft.reference_path(G, layer, batch)
    with open(f"{base}/proof.json") as f:
        proof = Proof.from_json(json.load(f))
    with open(f"{base}/public.json") as f:
        pub = [int(x) for x in json.load(f)]
    ours = sanitize(vk, proof, pub)
    with open(f"{base}/sanitized_proof.json") as f:
        golden = json.load(f)
    assert set(ours.keys()) == set(golden.keys())
    for k in golden:
        assert ours[k] == golden[k], f"field {k} differs"
