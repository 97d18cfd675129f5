"""ctypes bindings for the C++ occupancy-mapping backend.

``NativeMultiInstanceMapping`` mirrors the Python
``MultiInstanceOccupancyMapping`` API (which remains the correctness
oracle) and adds the real-time pieces the reference keeps in C++
(``OctomapServer.cpp``): exact DDA ray carving and raycast label/depth
rendering. The shared library is built on first use with g++ -O3 -fopenmp
and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "csrc")
_SO = os.path.join(_CSRC, "libmfm.so")
_LOCK = threading.Lock()
_LIB = None


def _build() -> str:
    src = os.path.join(_CSRC, "mapping.cpp")
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        src, "-o", _SO,
    ]
    subprocess.check_call(cmd)
    return _SO


def load_library(rebuild: bool = False):
    """Load (building if needed) the native library; None on failure."""
    global _LIB
    with _LOCK:
        if _LIB is not None and not rebuild:
            return _LIB
        so = _SO
        try:
            src = os.path.join(_CSRC, "mapping.cpp")
            if (
                rebuild
                or not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)
            ):
                _build()
            lib = ctypes.CDLL(so)
        except (OSError, subprocess.CalledProcessError):
            return None

        lib.mfm_create.restype = ctypes.c_void_p
        lib.mfm_destroy.argtypes = [ctypes.c_void_p]
        lib.mfm_initialize.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_double,
        ]
        lib.mfm_num_voxels.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.mfm_num_voxels.restype = ctypes.c_int64
        lib.mfm_num_instances.argtypes = [ctypes.c_void_p]
        lib.mfm_instance_ids.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ]
        lib.mfm_integrate.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float32, flags="C"), ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C"), ctypes.c_int,
        ]
        lib.mfm_update.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float32, flags="C"), ctypes.c_int64,
        ]
        lib.mfm_query.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C"), ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32, flags="C"),
        ]
        lib.mfm_get_target_grids.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int64, flags="C"), ctypes.c_double,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
        ]
        lib.mfm_get_target_grids_batch.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int32, flags="C"), ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
        ]
        lib.mfm_extract_points.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C"), ctypes.c_int64,
        ]
        lib.mfm_extract_points.restype = ctypes.c_int64
        lib.mfm_render.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            ctypes.c_int, ctypes.c_int, ctypes.c_double,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
        ]
        lib.mfm_reset.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def available() -> bool:
    return load_library() is not None


class NativeMultiInstanceMapping:
    """C++-backed multi-instance occupancy mapping (OctomapServer core)."""

    def __init__(self):
        lib = load_library()
        if lib is None:
            raise RuntimeError(
                "native mapping backend unavailable (g++ build failed)"
            )
        self._lib = lib
        self._h = lib.mfm_create()

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.mfm_destroy(self._h)
            self._h = None

    @property
    def instance_ids(self):
        n = self._lib.mfm_num_instances(self._h)
        buf = (ctypes.c_int * max(n, 1))()
        self._lib.mfm_instance_ids(self._h, buf)
        return [buf[i] for i in range(n)]

    def initialize(self, instance_id: int, *, pitch: float):
        rc = self._lib.mfm_initialize(self._h, int(instance_id), float(pitch))
        if rc != 0:
            raise ValueError(f"instance {instance_id} already exists")

    def integrate(
        self, instance_id, mask, pcd, origin=(0, 0, 0), carve: bool = True
    ):
        nonnan = ~np.isnan(pcd).any(axis=2)
        points = np.ascontiguousarray(
            pcd[mask & nonnan], dtype=np.float32
        )
        origin = np.ascontiguousarray(origin, dtype=np.float64)
        self._lib.mfm_integrate(
            self._h, int(instance_id), points, len(points), origin,
            int(carve),
        )

    def update(self, instance_id, occupied):
        pts = np.ascontiguousarray(occupied, dtype=np.float32)
        self._lib.mfm_update(self._h, int(instance_id), pts, len(pts))

    def query_probability(self, instance_id, points) -> np.ndarray:
        pts = np.ascontiguousarray(points, dtype=np.float64)
        out = np.empty(len(pts), np.float32)
        self._lib.mfm_query(self._h, int(instance_id), pts, len(pts), out)
        return out

    def num_voxels(self, instance_id) -> int:
        return int(self._lib.mfm_num_voxels(self._h, int(instance_id)))

    def get_target_grids(
        self, target_id, *, dimensions, pitch, origin
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        dims = np.ascontiguousarray(dimensions, dtype=np.int64)
        origin = np.ascontiguousarray(origin, dtype=np.float64)
        shape = tuple(int(d) for d in dimensions)
        g_t = np.zeros(shape, np.float32)
        g_n = np.zeros(shape, np.float32)
        g_e = np.zeros(shape, np.float32)
        self._lib.mfm_get_target_grids(
            self._h, int(target_id), dims, float(pitch), origin,
            g_t.reshape(-1), g_n.reshape(-1), g_e.reshape(-1),
        )
        return g_t, g_n, g_e

    def get_target_grids_batch(
        self, target_ids, *, dimensions, pitches, origins
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(N, X, Y, Z) target/nontarget/empty grids in one native call."""
        ids = np.ascontiguousarray(target_ids, dtype=np.int32)
        n = len(ids)
        dims = np.ascontiguousarray(dimensions, dtype=np.int64)
        pitches = np.ascontiguousarray(pitches, dtype=np.float64)
        origins = np.ascontiguousarray(origins, dtype=np.float64)
        shape = (n,) + tuple(int(d) for d in dimensions)
        g_t = np.zeros(shape, np.float32)
        g_n = np.zeros(shape, np.float32)
        g_e = np.zeros(shape, np.float32)
        self._lib.mfm_get_target_grids_batch(
            self._h, ids, n, dims, pitches, origins.reshape(-1),
            g_t.reshape(n, -1), g_n.reshape(n, -1), g_e.reshape(n, -1),
        )
        return g_t, g_n, g_e

    def get_target_pcds(
        self, target_id, aabb_min=None, aabb_max=None
    ) -> Tuple[np.ndarray, np.ndarray]:
        n = self.num_voxels(target_id)
        out = []
        for occ in (1, 0):
            buf = np.zeros((max(n, 1), 3), np.float64)
            k = self._lib.mfm_extract_points(
                self._h, int(target_id), occ, buf.reshape(-1), n
            )
            pts = buf[: max(k, 0)]
            if aabb_min is not None:
                pts = pts[(pts >= aabb_min).all(axis=1)]
            if aabb_max is not None:
                pts = pts[(pts < aabb_max).all(axis=1)]
            out.append(pts)
        return out[0], out[1]

    def render(
        self,
        K: np.ndarray,
        T_cam2world: np.ndarray,
        shape: Tuple[int, int],
        max_range: float = 3.0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Raycast all maps -> (instance_label (H, W) int32 with -2 = no
        hit, depth (H, W) float32 NaN holes)."""
        H, W = shape
        label = np.full((H, W), -2, np.int32)
        depth = np.full((H, W), np.nan, np.float32)
        self._lib.mfm_render(
            self._h,
            np.ascontiguousarray(K, np.float64).reshape(-1),
            np.ascontiguousarray(T_cam2world, np.float64).reshape(-1),
            H, W, float(max_range),
            label.reshape(-1), depth.reshape(-1),
        )
        return label, depth

    def reset(self):
        self._lib.mfm_reset(self._h)
