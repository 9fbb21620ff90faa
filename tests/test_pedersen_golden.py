"""Pedersen commitment vs the reference's golden layer-3 public output:
the commitment our curve25519 math computes for (sum=354, blind=2) must
projectively equal the point the reference circuit emitted (the check
pedersen_commitment_checker.ts:47-63 performs)."""

import json

import pytest

import tests.conftest as cft
from zkpoa_tpu.fields.curve25519 import (
    is_on_curve,
    pedersen_commitment,
    point_equal,
)
from zkpoa_tpu.utils.serde import from_limbs_85x3

pytestmark = pytest.mark.skipif(not cft.has_reference(), reason="reference fixtures not mounted")


def _golden():
    path = cft.reference_path("tests", "1_sigs_1_batches_5_height", "layer_three", "public.json")
    with open(path) as f:
        pub = json.load(f)
    regs = [int(x) for x in pub[:12]]
    point = tuple(from_limbs_85x3(regs[3 * i : 3 * i + 3]) for i in range(4))
    inp = cft.reference_path("tests", "1_sigs_1_batches_5_height", "layer_three_input.json")
    with open(inp) as f:
        d = json.load(f)
    bits = [int(b) for b in d["ped_com_blinding_factor"]]
    blind = sum(b << i for i, b in enumerate(bits))
    return point, blind


def test_golden_commitment_matches():
    point, blind = _golden()
    assert is_on_curve(point)
    assert blind == 2
    ours = pedersen_commitment(354, blind)
    assert point_equal(point, ours)
    # wrong sum / wrong blind must not match
    assert not point_equal(point, pedersen_commitment(355, blind))
    assert not point_equal(point, pedersen_commitment(354, blind + 1))
