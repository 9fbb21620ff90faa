"""ctypes binding for the native MSM stream planner (native/msm_plan.cc).

Plans Pippenger round streams on the host CPU in one call: signed-digit
recode + per-window stable counting sort + bucket runs + round bound.
Replaces the numpy planning path (radix argsort + take_along per window)
that cost ~12s per MSM at N=2^20 — the single dominant term of the
measured on-hardware MSM time. Falls back cleanly when no compiler
exists (`available()`)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "msm_plan.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libzkpoa_plan.so")


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


@lru_cache(maxsize=1)
def _load():
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.zkpoa_msm_plan2.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.zkpoa_msm_plan2.restype = ctypes.c_int64
    return lib


def available(n_bits: int = 254, c: int = 11) -> bool:
    """Planner usable for this geometry (nw <= 64 — the carry bitmask
    width — and 2 <= c <= 14, the library's window range; other shapes
    fall back to the numpy mirror)."""
    if (n_bits + c - 1) // c > 64 or not 2 <= c <= 14:
        return False
    return _load() is not None


def plan_stream(
    scalars_limbs: np.ndarray,
    n_bits: int,
    c: int,
    point_valid: Optional[np.ndarray] = None,
    top_stride: int = 0,
    top_block: int = 0,
) -> Tuple[int, np.ndarray, np.ndarray, np.ndarray]:
    """(raw_rounds, order_y [nw, N] int32, b_start, b_end [nw, nb] int32)
    — bit-identical to msm_pallas.plan_msm + _stream_indices_host.
    `top_stride` must match the consumer MsmPlan's top-window alias
    stride (0 = legacy 2^rem)."""
    lib = _load()
    assert lib is not None, "native planner unavailable"
    sc = np.ascontiguousarray(scalars_limbs, dtype=np.uint32)
    n, n_limbs = sc.shape
    nw = (n_bits + c - 1) // c
    nb = 1 << (c - 1)
    order_y = np.zeros((nw, n), dtype=np.int32)
    b_start = np.zeros((nw, nb), dtype=np.int32)
    b_end = np.zeros((nw, nb), dtype=np.int32)
    pv = None
    pv_ptr = None
    if point_valid is not None:
        pv = np.ascontiguousarray(point_valid, dtype=np.uint8)
        pv_ptr = pv.ctypes.data_as(ctypes.c_void_p)
    occ = lib.zkpoa_msm_plan2(
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n, n_limbs, n_bits, c, top_stride, top_block, pv_ptr,
        order_y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b_start.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b_end.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    assert occ > 0, f"native planner rejected args (c={c}, n_bits={n_bits})"
    return int(occ), order_y, b_start, b_end
