"""Layer-3 circuit: aggregation + Pedersen commitment, checked against the
reference's golden artifacts (point equality of the commitment — projective
registers are algorithm-dependent, and the reference's own checker compares
points, scripts/pedersen_commitment_checker.ts:58-63)."""

import json

import pytest

import tests.conftest as cft
from zkpoa_tpu.fields import curve25519 as C
from zkpoa_tpu.models.layers import layer_three_circuit
from zkpoa_tpu.utils.serde import from_limbs_85x3

GOLD = ("tests", "1_sigs_1_batches_5_height", "layer_three")


def _golden():
    with open(cft.reference_path(*GOLD, "layer_three_input.json")) as f:
        inp = json.load(f)
    with open(cft.reference_path(*GOLD, "public.json")) as f:
        pub = [int(x) for x in json.load(f)]
    return inp, pub


def _dechunk_point(regs):
    coords = [from_limbs_85x3(regs[i * 3 : (i + 1) * 3]) for i in range(4)]
    return tuple(coords)


@pytest.mark.skipif(not cft.has_reference(), reason="reference fixtures not mounted")
def test_host_commitment_matches_golden():
    inp, pub = _golden()
    balances = [int(b) for b in inp["balances"]]
    blind = sum(int(b) << i for i, b in enumerate(inp["ped_com_blinding_factor"]))
    com = C.pedersen_commitment(sum(balances), blind)
    golden_pt = _dechunk_point(pub[:12])
    assert C.point_equal(com, golden_pt)


@pytest.mark.slow
@pytest.mark.skipif(not cft.has_reference(), reason="reference fixtures not mounted")
def test_layer_three_circuit_golden():
    inp, pub = _golden()
    balances = [int(b) for b in inp["balances"]]
    blind = sum(int(b) << i for i, b in enumerate(inp["ped_com_blinding_factor"]))
    merkle_root = int(inp["merkle_root"])

    c = layer_three_circuit(balances, merkle_root, blind)
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)

    pv = c.public_values
    ours = _dechunk_point(pv[:12])
    golden_pt = _dechunk_point(pub[:12])
    assert C.point_equal(ours, golden_pt)
    assert pv[12] == pub[12] == merkle_root
