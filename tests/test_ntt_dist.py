"""Distributed four-step NTT / QAP quotient (parallel/ntt_dist.py): one
all_to_all per transform over a virtual 8-device CPU mesh; must equal the
single-device ops.ntt.quotient bit-exactly."""

import numpy as np
import pytest

import tests.conftest as cft  # noqa: F401
import jax
import jax.numpy as jnp

from zkpoa_tpu.fields.bn254 import R
from zkpoa_tpu.ops.limbs import BN254_FR
from zkpoa_tpu.ops.ntt import ntt, quotient
from zkpoa_tpu.parallel.mesh import make_mesh
from zkpoa_tpu.parallel import ntt_dist


@pytest.mark.parametrize("n", [64, 256])
def test_quotient_dist_matches_single_device(n):
    mesh = make_mesh(8, axis="data")
    rng = np.random.default_rng(11)
    a_v = [int.from_bytes(rng.bytes(31), "big") % R for _ in range(n)]
    b_v = [int.from_bytes(rng.bytes(31), "big") % R for _ in range(n)]
    # make (A*B - C) divisible by Z on the domain: set C = A*B pointwise
    c_v = [a * b % R for a, b in zip(a_v, b_v)]
    enc = BN254_FR.encode
    a_m, b_m, c_m = enc(a_v), enc(b_v), enc(c_v)
    want = np.asarray(quotient(a_m, b_m, c_m))
    got = np.asarray(ntt_dist.quotient_dist(a_m, b_m, c_m, mesh))
    assert (want == got).all()


def test_dist_ntt_jaxpr_has_all_to_all():
    mesh = make_mesh(8, axis="data")
    n = 64
    a_m = BN254_FR.encode([i + 1 for i in range(n)])
    jaxpr = jax.make_jaxpr(
        lambda a, b, c: ntt_dist.quotient_dist(a, b, c, mesh)
    )(a_m, a_m, a_m)
    assert "all_to_all" in str(jaxpr)
