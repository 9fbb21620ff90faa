"""Native C++ MSM stream planner vs the numpy mirror — bit-identical
plans (digits, stable bucket order, runs, round bound)."""

import numpy as np
import pytest

from conftest import *  # noqa: F401,F403

from zkpoa_tpu.fields.bn254 import R
from zkpoa_tpu.native import plan as nplan
from zkpoa_tpu.ops import msm_pallas as M2

pytestmark = pytest.mark.skipif(
    not nplan.available(), reason="no native compiler"
)


@pytest.mark.parametrize("c", [5, 11, 13])
@pytest.mark.parametrize("masked", [False, True])
def test_native_plan_matches_numpy(c, masked):
    rng = np.random.default_rng(11)
    n = 500
    scalars = [int.from_bytes(rng.bytes(32), "big") % R for _ in range(n - 3)]
    scalars += [0, 1, R - 1]
    sc = M2.scalars_to_limbs_fast(scalars)
    pv = rng.integers(0, 2, size=n).astype(bool) if masked else None

    plan_np = M2.plan_msm(sc, 254, c, pv)
    oy_np, bs_np, be_np = M2._stream_indices_host(plan_np, sc, pv)

    occ, oy, bs, be = nplan.plan_stream(
        sc, 254, c, pv,
        top_stride=plan_np.top_stride, top_block=plan_np.top_block)
    rounds = ((occ + M2.ROUND_GRANULE - 1) // M2.ROUND_GRANULE) * M2.ROUND_GRANULE
    assert rounds == plan_np.rounds
    assert (bs == bs_np).all()
    assert (be == be_np).all()
    # order entries only matter inside bucket runs (positions past the
    # used prefix are sentinel-sorted in numpy, zero-filled natively)
    for w in range(plan_np.nw):
        used = int(be_np[w, -1])
        assert (oy[w, :used] == oy_np[w, :used]).all()


def test_plan_and_stream_roundtrip():
    rng = np.random.default_rng(3)
    n = 300
    scalars = [int.from_bytes(rng.bytes(32), "big") % R for _ in range(n)]
    sc = M2.scalars_to_limbs_fast(scalars)
    plan, (oy, bs, be) = M2.plan_and_stream(sc, 254, 11, None)
    plan_np = M2.plan_msm(sc, 254, 11, None)
    assert plan.rounds == plan_np.rounds
    assert plan.key() == plan_np.key()
