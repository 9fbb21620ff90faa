"""ctypes bindings for the native C++ engine (native/poseidon_merkle.cc).

Builds the shared library on first use (g++ -O3 -fopenmp) and injects the
circomlib-compatible Poseidon parameters from the single-source generator
(zkpoa_tpu.ops.poseidon_params). Falls back cleanly: `available()` is False
when no compiler is present, and callers use the JAX/host paths instead."""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "poseidon_merkle.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libzkpoa_native.so")


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-o", _LIB, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return _LIB


def _mont_limbs64(x: int, r: int, p: int) -> List[int]:
    xm = x * r % p
    return [(xm >> (64 * i)) & ((1 << 64) - 1) for i in range(4)]


@lru_cache(maxsize=1)
def _load():
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.zkpoa_init.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.zkpoa_poseidon2_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
    ]
    lib.zkpoa_merkle_build.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.zkpoa_merkle_build.restype = ctypes.c_int
    lib.zkpoa_num_threads.restype = ctypes.c_int

    from ..fields.bn254 import R as P_FR
    from ..ops.poseidon_params import R_F, n_partial_rounds, poseidon_params

    r_mont = pow(2, 256, P_FR)
    n0inv = (-pow(P_FR, -1, 1 << 64)) % (1 << 64)
    mod = np.array(
        [(P_FR >> (64 * i)) & ((1 << 64) - 1) for i in range(4)], dtype=np.uint64
    )
    consts, mds = poseidon_params(3)
    r_p = n_partial_rounds(3)
    n_rounds = R_F + r_p
    ark = np.array(
        [_mont_limbs64(c, r_mont, P_FR) for c in consts], dtype=np.uint64
    ).reshape(-1)
    mds_flat = np.array(
        [_mont_limbs64(mds[i][j], r_mont, P_FR) for i in range(3) for j in range(3)],
        dtype=np.uint64,
    ).reshape(-1)
    lib.zkpoa_init(
        mod.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n0inv, n_rounds, R_F // 2, r_p,
        ark.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        mds_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    return lib


def available() -> bool:
    return _load() is not None


def _to_mont64(vals: List[int]) -> np.ndarray:
    from ..fields.bn254 import R as P_FR

    r_mont = pow(2, 256, P_FR)
    out = np.empty((len(vals), 4), dtype=np.uint64)
    for i, v in enumerate(vals):
        out[i] = _mont_limbs64(int(v), r_mont, P_FR)
    return out


def _from_mont64(arr: np.ndarray) -> List[int]:
    from ..fields.bn254 import R as P_FR

    r_inv = pow(pow(2, 256, P_FR), -1, P_FR)
    out = []
    for row in arr.reshape(-1, 4):
        x = 0
        for limb in row[::-1]:
            x = (x << 64) | int(limb)
        out.append(x * r_inv % P_FR)
    return out


def poseidon2_batch(left: List[int], right: List[int]) -> List[int]:
    """Native parallel Poseidon(2) over int pairs."""
    lib = _load()
    assert lib is not None, "native engine unavailable"
    n = len(left)
    l_arr = _to_mont64(left)
    r_arr = _to_mont64(right)
    out = np.empty((n, 4), dtype=np.uint64)
    lib.zkpoa_poseidon2_batch(
        l_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        r_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n,
    )
    return _from_mont64(out)


def merkle_build_native(addresses: List[int], balances: List[int], height: int):
    """Full native tree build: returns (root, flat levels as ints).
    Same leaf/padding semantics as merkle.tree.MerkleTree.build."""
    lib = _load()
    assert lib is not None, "native engine unavailable"
    n_leaves = 1 << (height - 1)
    assert len(addresses) <= n_leaves
    leaves = poseidon2_batch(addresses, balances)
    leaves = leaves + [0] * (n_leaves - len(leaves))
    leaves_arr = _to_mont64(leaves)
    out = np.zeros((2 * n_leaves - 1, 4), dtype=np.uint64)
    lib.zkpoa_merkle_build(
        leaves_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n_leaves,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    nodes = _from_mont64(out)
    return nodes[-1], nodes
