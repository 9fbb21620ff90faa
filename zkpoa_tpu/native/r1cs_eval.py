"""ctypes binding for the native R1CS evaluator (native/r1cs_eval.cc) —
the C++ fast path for <A,w>*<B,w> == <C,w> checks (circom's generated C++
witness-generator main loop / rapidsnark's constraint handling in the
reference, SURVEY.md §2.5). Python's per-row evaluator needs minutes at
10^7 constraints; this runs it multi-core in seconds.

Falls back cleanly: available() is False without a compiler, and callers
use R1CS.is_satisfied."""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

from ..fields.bn254 import R as _FR  # noqa: F401 (kept for callers)

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "r1cs_eval.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libzkpoa_r1cs.so")

FR_MOD = 21888242871839275222246405745257275088548364400416034343698204186575808495617
_MONT_R = pow(2, 256, FR_MOD)


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


@lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.zkpoa_r1cs_eval.restype = ctypes.c_int
    lib.zkpoa_r1cs_eval.argtypes = [
        ctypes.c_uint64, ctypes.c_uint64, ctypes.c_void_p,
        ctypes.c_uint64, ctypes.c_void_p,
        ctypes.c_uint64, ctypes.c_void_p,
        ctypes.c_uint64, ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    return lib


def available() -> bool:
    return _lib() is not None


def _pack_rows(rows) -> np.ndarray:
    """[(constraint, wire, coeff)] -> packed Row records (6 uint64), coeff
    Montgomery-encoded. Rows must already be sorted by constraint (the
    Circuit builder emits them in order)."""
    n = len(rows)
    out = np.zeros((n, 6), dtype=np.uint64)
    for i, (ci, wi, co) in enumerate(rows):
        out[i, 0] = ci
        out[i, 1] = wi
        cm = (co % FR_MOD) * _MONT_R % FR_MOD
        out[i, 2] = cm & 0xFFFFFFFFFFFFFFFF
        out[i, 3] = (cm >> 64) & 0xFFFFFFFFFFFFFFFF
        out[i, 4] = (cm >> 128) & 0xFFFFFFFFFFFFFFFF
        out[i, 5] = (cm >> 192) & 0xFFFFFFFFFFFFFFFF
    return out


def _pack_witness(witness) -> np.ndarray:
    blob = b"".join(int(w % FR_MOD).to_bytes(32, "little") for w in witness)
    return np.frombuffer(blob, dtype="<u8").reshape(len(witness), 4).copy()


def is_satisfied(r1cs, witness) -> Tuple[bool, int]:
    """Native satisfiability check. Returns (ok, first_bad_constraint).
    Raises RuntimeError if the native library is unavailable."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native r1cs evaluator unavailable (no compiler?)")
    ra = _pack_rows(r1cs.a_rows)
    rb = _pack_rows(r1cs.b_rows)
    rc = _pack_rows(r1cs.c_rows)
    w = _pack_witness(witness)
    bad = ctypes.c_uint64(0)
    rcode = lib.zkpoa_r1cs_eval(
        r1cs.n_constraints, r1cs.n_wires, w.ctypes.data_as(ctypes.c_void_p),
        len(ra), ra.ctypes.data_as(ctypes.c_void_p),
        len(rb), rb.ctypes.data_as(ctypes.c_void_p),
        len(rc), rc.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(bad),
    )
    return rcode == 0, int(bad.value)
