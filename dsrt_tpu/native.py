"""ctypes bridge to the native C++ scene-compile kernels.

The reference keeps its scene compiler in C++ (src/gpu_scene_builder.cpp);
here the hot host-side pieces — BVH construction and OBJ parsing — have
native implementations in native/ (built with `make -C native`), loaded via
ctypes.  Everything degrades gracefully to the NumPy builders when the
shared library is absent, so the framework has no hard native dependency.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    for cand in (os.path.join(here, "native", "libdsrt_native.so"),
                 os.path.join(here, "..", "native", "libdsrt_native.so")):
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                _bind(lib)
                _LIB = lib
                break
            except OSError:
                pass
    return _LIB


def _bind(lib: ctypes.CDLL) -> None:
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.dsrt_build_bvh.restype = ctypes.c_int
    lib.dsrt_build_bvh.argtypes = [
        f32p, f32p, f32p, ctypes.c_int,          # v0, v1, v2, n
        ctypes.c_int,                             # method: 0 median, 1 sah
        f32p, f32p,                               # out bbox_min/max (2N,3)
        i32p, i32p, i32p, i32p,                   # out left/right/off/cnt
        i32p,                                     # out tri_indices (n)
    ]
    if hasattr(lib, "dsrt_build_sbvh"):
        lib.dsrt_build_sbvh.restype = ctypes.c_int
        lib.dsrt_build_sbvh.argtypes = [
            f32p, f32p, f32p, ctypes.c_int,       # v0, v1, v2, n
            ctypes.c_float, ctypes.c_float,       # alpha, ref_budget
            ctypes.c_int, ctypes.c_int,           # cap_nodes, cap_refs
            f32p, f32p,                           # out bbox_min/max
            i32p, i32p, i32p, i32p,               # out left/right/off/cnt
            i32p,                                 # out ref list
            np.ctypeslib.ndpointer(np.int32),     # out n_refs (1,)
        ]


def available() -> bool:
    return _find_lib() is not None


def build_bvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
              method: str = "median", alpha: float = 1e-5,
              ref_budget: float = 2.0):
    """Native BVH build; returns a models.bvh_build.BVH or None if the
    native library is unavailable.  `alpha` / `ref_budget` tune the
    SBVH spatial-split gate (overlap-area fraction of root SA that
    triggers a spatial-split attempt) and the reference cap
    (budget * n) — ignored for median/sah."""
    lib = _find_lib()
    if lib is None:
        return None
    from dsrt_tpu.models.bvh_build import BVH

    n = len(v0)
    if method == "sbvh":
        if not hasattr(lib, "dsrt_build_sbvh"):
            return None
        budget = float(ref_budget)
        cap_refs = int(budget * n) + 8
        cap_nodes = 2 * cap_refs + 8
        bb_min = np.empty((cap_nodes, 3), np.float32)
        bb_max = np.empty((cap_nodes, 3), np.float32)
        left = np.empty(cap_nodes, np.int32)
        right = np.empty(cap_nodes, np.int32)
        off = np.empty(cap_nodes, np.int32)
        cnt = np.empty(cap_nodes, np.int32)
        idx = np.empty(cap_refs, np.int32)
        n_refs = np.zeros(1, np.int32)
        n_nodes = lib.dsrt_build_sbvh(
            np.ascontiguousarray(v0, np.float32),
            np.ascontiguousarray(v1, np.float32),
            np.ascontiguousarray(v2, np.float32),
            n, np.float32(alpha), np.float32(budget), cap_nodes, cap_refs,
            bb_min, bb_max, left, right, off, cnt, idx, n_refs)
        if n_nodes <= 0:
            return None
        m = int(n_refs[0])
        return BVH(bb_min[:n_nodes].copy(), bb_max[:n_nodes].copy(),
                   left[:n_nodes].copy(), right[:n_nodes].copy(),
                   off[:n_nodes].copy(), cnt[:n_nodes].copy(),
                   idx[:m].copy())
    cap = max(2 * n, 1)
    bb_min = np.empty((cap, 3), np.float32)
    bb_max = np.empty((cap, 3), np.float32)
    left = np.empty(cap, np.int32)
    right = np.empty(cap, np.int32)
    off = np.empty(cap, np.int32)
    cnt = np.empty(cap, np.int32)
    idx = np.empty(n, np.int32)
    m = {"median": 0, "sah": 1}[method]
    n_nodes = lib.dsrt_build_bvh(
        np.ascontiguousarray(v0, np.float32),
        np.ascontiguousarray(v1, np.float32),
        np.ascontiguousarray(v2, np.float32),
        n, m, bb_min, bb_max, left, right, off, cnt, idx)
    if n_nodes <= 0:
        return None
    return BVH(bb_min[:n_nodes].copy(), bb_max[:n_nodes].copy(),
               left[:n_nodes].copy(), right[:n_nodes].copy(),
               off[:n_nodes].copy(), cnt[:n_nodes].copy(), idx)
