"""Native C++ R1CS evaluator (native/r1cs_eval.cc): must agree with the
Python R1CS.is_satisfied on both satisfying and corrupted witnesses."""

import pytest

import tests.conftest as cft  # noqa: F401
from zkpoa_tpu.models.gadgets.poseidon_gadget import poseidon
from zkpoa_tpu.models.r1cs import Circuit
from zkpoa_tpu.native import r1cs_eval


def _toy():
    c = Circuit()
    out = c.public_output()
    x = c.var(3)
    y = c.var(4)
    h = poseidon(c, [x, y])
    c.bind_output(out, h)
    return c.compile()


@pytest.mark.skipif(not r1cs_eval.available(), reason="no C++ compiler")
def test_native_matches_python():
    r1cs, wit = _toy()
    ok, bad = r1cs_eval.is_satisfied(r1cs, wit)
    assert ok and r1cs.is_satisfied(wit)
    wit2 = list(wit)
    wit2[5] = (wit2[5] + 1) % (2**250)
    ok2, bad2 = r1cs_eval.is_satisfied(r1cs, wit2)
    assert not ok2 and not r1cs.is_satisfied(wit2)
    assert bad2 < r1cs.n_constraints
