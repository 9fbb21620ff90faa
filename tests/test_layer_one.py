"""Layer-1 circuit: golden statement parity with the reference.

The slow test builds the full in-circuit batch-ECDSA* verification from the
reference's golden input JSON and checks the single public output equals the
golden public.json (the Poseidon sponge of pubkey x-coord registers) —
statement-level bit-exactness per SURVEY.md §7."""

import json

import pytest

import tests.conftest as cft
from zkpoa_tpu.models.layers import LayerOneInput, layer_one_circuit

GOLD = "tests/1_sigs_1_batches_5_height"


def _load_golden_sigs():
    with open(cft.reference_path(*GOLD.split("/"), "layer_one", "batch_0",
                                 "layer_one_batch_0_input.json")) as f:
        d = json.load(f)
    n = len(d["r"])
    return [LayerOneInput.from_json_entry(d, i) for i in range(n)]


@pytest.mark.skipif(not cft.has_reference(), reason="reference fixtures not mounted")
def test_layer_one_input_parse():
    sigs = _load_golden_sigs()
    assert len(sigs) == 1
    assert all(len(x) == 4 for x in (sigs[0].r, sigs[0].s, sigs[0].msghash))


@pytest.mark.slow
@pytest.mark.skipif(not cft.has_reference(), reason="reference fixtures not mounted")
def test_layer_one_circuit_golden_output():
    sigs = _load_golden_sigs()
    c = layer_one_circuit(sigs)
    with open(cft.reference_path(*GOLD.split("/"), "layer_one", "batch_0",
                                 "public.json")) as f:
        golden_public = [int(x) for x in json.load(f)]
    assert c.public_values == golden_public
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)
