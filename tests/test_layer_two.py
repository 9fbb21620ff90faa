"""Layer-2 accounting-core circuit against the reference's golden input:
public signals must equal the golden public.json [balance_sum, merkle_root],
with the address derivation, sponge equality, ordering, and Merkle
inclusion all constrained in-circuit."""

import json

import pytest

import tests.conftest as cft
from zkpoa_tpu.models.layers import LayerTwoInput, layer_two_circuit

GOLD = ("tests", "1_sigs_1_batches_5_height")


def _golden():
    with open(cft.reference_path(*GOLD, "layer_two", "batch_0",
                                 "layer_two_batch_0_input.json")) as f:
        inp = LayerTwoInput.from_json(json.load(f))
    with open(cft.reference_path(*GOLD, "layer_two", "batch_0", "public.json")) as f:
        pub = [int(x) for x in json.load(f)]
    return inp, pub


@pytest.mark.skipif(not cft.has_reference(), reason="reference fixtures not mounted")
def test_layer_two_circuit_golden():
    inp, pub = _golden()
    c = layer_two_circuit(inp, tree_height=5)
    assert c.public_values == pub  # [balance_sum, merkle_root]
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)


@pytest.mark.skipif(not cft.has_reference(), reason="reference fixtures not mounted")
def test_layer_two_rejects_wrong_balance():
    inp, pub = _golden()
    inp.leaf_balances = [b + 1 for b in inp.leaf_balances]
    with pytest.raises(AssertionError):
        # leaf no longer in the tree -> merkle_verify witness check fails
        layer_two_circuit(inp, tree_height=5, check=True)
