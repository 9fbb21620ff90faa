"""Pippenger MSM vs exact host math, including edge cases (zero scalars,
infinity points, duplicate digits, tiny and skewed batches)."""

import random

import pytest

import tests.conftest  # noqa: F401

from zkpoa_tpu.fields import bn254
from zkpoa_tpu.ops import msm as M
from zkpoa_tpu.ops.curve_jax import BN254_G1

rng = random.Random(1234)


def _host_msm(points, scalars):
    acc = None
    for p, s in zip(points, scalars):
        acc = bn254.g1_add(acc, bn254.g1_mul(p, s) if p is not None else None)
    return acc


def _rand_points(n):
    return [bn254.g1_mul(bn254.G1_GEN, rng.randrange(1, bn254.R)) for _ in range(n)]


@pytest.mark.parametrize("n,c", [(1, 4), (7, 4), (32, 8), (100, 8)])
def test_msm_random(n, c):
    pts = _rand_points(n)
    scalars = [rng.randrange(bn254.R) for _ in range(n)]
    assert M.msm(BN254_G1, pts, scalars, c=c) == _host_msm(pts, scalars)


def test_msm_zero_scalars():
    pts = _rand_points(4)
    assert M.msm(BN254_G1, pts, [0, 0, 0, 0], c=4) is None


def test_msm_with_infinity_points_and_zeros():
    pts = _rand_points(3) + [None]
    scalars = [5, 0, rng.randrange(bn254.R), 7]
    assert M.msm(BN254_G1, pts, scalars, c=5) == _host_msm(pts, scalars)


def test_msm_duplicate_digits_skew():
    # all equal scalars stress a single bucket (max occupancy = N)
    pts = _rand_points(16)
    scalars = [12345] * 16
    assert M.msm(BN254_G1, pts, scalars, c=6) == _host_msm(pts, scalars)


def test_msm_small_scalars():
    pts = _rand_points(8)
    scalars = [1, 2, 3, 4, 5, 6, 7, 8]
    assert M.msm(BN254_G1, pts, scalars, c=4) == _host_msm(pts, scalars)


def test_msm_max_scalar():
    pts = _rand_points(2)
    scalars = [bn254.R - 1, bn254.R - 2]
    assert M.msm(BN254_G1, pts, scalars, c=8) == _host_msm(pts, scalars)
