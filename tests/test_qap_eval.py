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


def test_high_fanin_scatter_target_no_overflow():
    """A scatter target collecting >= 2^16 rows (the setup's per-wire
    direction: wire 0 is in nearly every constraint) must take the
    reduce-every-chunk path — the carry-free adds overflow uint32 there
    (the round-3 layer-1 hardware verify failure)."""
    from zkpoa_tpu.models.r1cs import PackedMatrix, PackedR1CS
    from zkpoa_tpu.ops.qap_eval import eval_at_tau_device

    m = 70_000  # > 2^16 rows, all onto wire 0
    rows = PackedMatrix(
        idx=np.zeros(m, np.int32),        # constraint index (gather side)
        wire=np.zeros(m, np.int32),       # all -> wire 0
        cid=np.zeros(m, np.int32),        # coeff 1
    )
    empty = PackedMatrix(np.zeros(0, np.int32), np.zeros(0, np.int32),
                         np.zeros(0, np.int32))
    packed = PackedR1CS(
        a=rows, b=empty, c=empty,
        pool_limbs=scalars_to_limbs_fast([1]),
        n_wires=4, n_public=0, n_constraints=1,
    )
    lag_val = 0x1234567890ABCDEF1234567890ABCDEF
    lag = scalars_to_limbs_fast([lag_val])
    a_t, b_t, c_t = eval_at_tau_device(packed, lag, 4)
    got = int(BN254_FR.from_limbs(np.asarray(a_t))[0])
    assert got == m * lag_val % R
    assert int(BN254_FR.from_limbs(np.asarray(b_t))[0]) == 0
