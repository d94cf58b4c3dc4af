"""ctypes bindings for the native runtime (libdawn_rt.so).

Native equivalents of the reference's three non-Python components
(SURVEY.md section 2.6): the Cython NMS, the C rasterizer, and — upgraded
from torch DataLoader workers — a threaded npy prefetch reader.
Build: ``make -C dawn_tpu/runtime/src`` (gcc only, no deps).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libdawn_rt.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def build(force: bool = False) -> bool:
    """Compile the shared library in-tree. Returns True on success."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    src = os.path.join(os.path.dirname(_LIB_PATH), "src")
    try:
        subprocess.run(["make", "-C", src], check=True, capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load(auto_build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    if not os.path.exists(_LIB_PATH) and auto_build:
        build()
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    lib.dawn_nms.restype = ctypes.c_int64
    lib.dawn_nms.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                             ctypes.c_float, ctypes.POINTER(ctypes.c_int64)]
    lib.dawn_render_mesh.restype = None
    lib.dawn_render_depth.restype = None
    if hasattr(lib, "dawn_render_colors"):   # absent in pre-round-4 builds
        lib.dawn_render_colors.restype = None
    lib.dawn_npy_read.restype = ctypes.c_int64
    lib.dawn_prefetch_create.restype = ctypes.c_void_p
    lib.dawn_prefetch_next.restype = ctypes.c_int64
    _lib = lib
    return lib


def nms(lib: ctypes.CDLL, dets: np.ndarray, thresh: float) -> np.ndarray:
    dets = np.ascontiguousarray(dets, dtype=np.float32)
    n = dets.shape[0]
    keep = np.empty(n, dtype=np.int64)
    nkeep = lib.dawn_nms(dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                         n, ctypes.c_float(thresh),
                         keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return keep[:nkeep]


def render_mesh(lib: ctypes.CDLL, vertices: np.ndarray, triangles: np.ndarray,
                image: np.ndarray, light_dir=(0.0, 0.0, 1.0),
                ambient: float = 0.6, diffuse: float = 0.4) -> np.ndarray:
    """Shade image (H, W, 3 float32 [0,1]) in place where the mesh covers."""
    vertices = np.ascontiguousarray(vertices, dtype=np.float32)
    triangles = np.ascontiguousarray(triangles, dtype=np.int32)
    image = np.ascontiguousarray(image, dtype=np.float32)
    light = np.asarray(light_dir, dtype=np.float32)
    lib.dawn_render_mesh(
        vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(vertices.shape[0]),
        triangles.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(triangles.shape[0]),
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(image.shape[0]), ctypes.c_int(image.shape[1]),
        light.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(ambient), ctypes.c_float(diffuse))
    return image


def render_depth(lib: ctypes.CDLL, vertices: np.ndarray,
                 triangles: np.ndarray, h: int, w: int) -> np.ndarray:
    """Barycentric z-buffered depth map: (H, W) float32, z normalized to
    [0, 1] where the mesh covers, 0 elsewhere (reference utils/depth.py)."""
    vertices = np.ascontiguousarray(vertices, dtype=np.float32)
    triangles = np.ascontiguousarray(triangles, dtype=np.int32)
    out = np.empty((h, w), dtype=np.float32)
    lib.dawn_render_depth(
        vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(vertices.shape[0]),
        triangles.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(triangles.shape[0]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(h), ctypes.c_int(w))
    return out


def render_colors(lib: ctypes.CDLL, vertices: np.ndarray,
                  triangles: np.ndarray, colors: np.ndarray,
                  image: np.ndarray) -> np.ndarray:
    """Barycentric per-vertex-color rasterization into `image` (H, W, 3
    float32, modified in place where the mesh covers) — the Sim3DR
    `rasterize` call the reference pncc/uv paths use."""
    if not hasattr(lib, "dawn_render_colors"):
        raise RuntimeError("libdawn_rt.so predates dawn_render_colors; "
                           "rebuild with dawn_tpu.runtime.native.build(force=True)")
    vertices = np.ascontiguousarray(vertices, dtype=np.float32)
    triangles = np.ascontiguousarray(triangles, dtype=np.int32)
    colors = np.ascontiguousarray(colors, dtype=np.float32)
    image = np.ascontiguousarray(image, dtype=np.float32)
    lib.dawn_render_colors(
        vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(vertices.shape[0]),
        triangles.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(triangles.shape[0]),
        colors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(image.shape[0]), ctypes.c_int(image.shape[1]))
    return image


class NpyPrefetcher:
    """Bounded-queue threaded reader of raw .npy payload bytes."""

    def __init__(self, n_threads: int = 4, queue_cap: int = 8):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("libdawn_rt.so unavailable (run runtime.native.build())")
        self._h = self._lib.dawn_prefetch_create(n_threads, queue_cap)

    def submit(self, path: str, tag: int = 0) -> None:
        self._lib.dawn_prefetch_submit(ctypes.c_void_p(self._h),
                                       path.encode(), ctypes.c_int64(tag))

    def next(self, nbytes: int) -> tuple[np.ndarray, int]:
        out = np.empty(nbytes, dtype=np.uint8)
        tag = ctypes.c_int64(0)
        got = self._lib.dawn_prefetch_next(
            ctypes.c_void_p(self._h),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(nbytes), ctypes.byref(tag))
        if got < 0:
            raise IOError(f"prefetch read failed ({got})")
        return out[:got], tag.value

    def close(self) -> None:
        if self._h:
            self._lib.dawn_prefetch_destroy(ctypes.c_void_p(self._h))
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
