"""Device sparse QAP evaluation (ops/qap_eval) vs the exact host loop."""

import numpy as np
import pytest

from conftest import *  # noqa: F401,F403

from zkpoa_tpu.fields.bn254 import R
from zkpoa_tpu.models.gadgets.poseidon_gadget import poseidon
from zkpoa_tpu.models.r1cs import Circuit
from zkpoa_tpu.ops import qap_eval as QE
from zkpoa_tpu.ops.limbs import BN254_FR
from zkpoa_tpu.ops.msm_pallas import scalars_to_limbs_fast


def _poseidon_system():
    c = Circuit()
    out = c.public_output()
    x = c.var(7)
    y = c.var(11)
    c.bind_output(out, poseidon(c, [x, y]))
    return c.compile()


def _decode(dev):
    return [int(v) for v in BN254_FR.from_limbs(np.asarray(dev))]


def test_device_matches_host_loop(monkeypatch):
    r1cs, wit = _poseidon_system()
    monkeypatch.setattr(QE, "CHUNK_ROWS", 64)  # force many chunks
    domain = 1
    while domain < r1cs.n_constraints:
        domain <<= 1
    a_h, b_h, c_h = r1cs.eval_matrices(wit)
    pad = [0] * (domain - len(a_h))
    w_limbs = scalars_to_limbs_fast([int(x) % R for x in wit])
    a_d, b_d, c_d = QE.eval_matrices_device(r1cs.pack(), w_limbs, domain)
    assert _decode(a_d) == a_h + pad
    assert _decode(b_d) == b_h + pad
    assert _decode(c_d) == c_h + pad


def test_ab_pointwise_fallback():
    """Systems without C rows (zkey imports) get C = A·B pointwise."""
    from zkpoa_tpu.models.r1cs import R1CS

    r1cs, wit = _poseidon_system()
    a_h, b_h, _ = r1cs.eval_matrices(wit)
    stripped = R1CS(
        n_wires=r1cs.n_wires, n_public=r1cs.n_public,
        a_rows=r1cs.a_rows, b_rows=r1cs.b_rows, c_rows=[],
        n_constraints=r1cs.n_constraints,
    )
    domain = 1
    while domain < r1cs.n_constraints:
        domain <<= 1
    w_limbs = scalars_to_limbs_fast([int(x) % R for x in wit])
    _, _, c_d = QE.eval_matrices_device(stripped.pack(), w_limbs, domain)
    want = [a * b % R for a, b in zip(a_h, b_h)] + [0] * (domain - len(a_h))
    assert _decode(c_d) == want


def test_high_fanin_constraint():
    """A constraint with hundreds of rows (bit recomposition style)
    exercises the carry-free scatter-add bound."""
    c = Circuit()
    out = c.public_output()
    bits = [c.var((12345 >> t) & 1) for t in range(300)]
    acc = 0
    for t, b in enumerate(bits):
        acc = acc + b * pow(2, t, R)
    c.bind_output(out, acc)
    r1cs, wit = c.compile()
    domain = 1
    while domain < max(r1cs.n_constraints, 2):
        domain <<= 1
    a_h, b_h, c_h = r1cs.eval_matrices(wit)
    w_limbs = scalars_to_limbs_fast([int(x) % R for x in wit])
    a_d, b_d, c_d = QE.eval_matrices_device(r1cs.pack(), w_limbs, domain)
    pad = [0] * (domain - len(a_h))
    assert _decode(a_d) == a_h + pad
    assert _decode(c_d) == c_h + pad
