"""ctypes bindings for the native host library (native/devt_host.cpp).

The C++ side provides the DALI-equivalent fused decode→resize→crop→
normalize path (SURVEY.md §2.7) and the Annoy-equivalent ANN index for the
retrieval tool.  The library auto-builds via ``make -C native`` on first
use when a toolchain is present; every consumer in devt_tpu degrades to
the PIL/numpy path when it is not (``available()`` gates the fast path).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libdevt_host.so")

_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=300)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    # Always run make (no-op when the .so is newer than the sources) so a
    # stale or foreign binary never shadows the audited devt_host.cpp; only
    # fall back to a pre-existing .so when no toolchain is present.
    if not _build() and not os.path.exists(_LIB_PATH):
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.devt_load_image_f32.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p]
    lib.devt_load_image_f32.restype = ctypes.c_int
    lib.devt_load_batch_f32.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, f32p, f32p, f32p, i32p, ctypes.c_int]
    lib.devt_load_batch_f32.restype = ctypes.c_int
    lib.devt_image_dims.argtypes = [ctypes.c_char_p, i32p, i32p]
    lib.devt_image_dims.restype = ctypes.c_int

    lib.devt_ann_create.argtypes = [ctypes.c_int]
    lib.devt_ann_create.restype = ctypes.c_void_p
    lib.devt_ann_destroy.argtypes = [ctypes.c_void_p]
    lib.devt_ann_add.argtypes = [ctypes.c_void_p, f32p]
    lib.devt_ann_size.argtypes = [ctypes.c_void_p]
    lib.devt_ann_size.restype = ctypes.c_int
    lib.devt_ann_query.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int,
                                   i32p, f32p]
    lib.devt_ann_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.devt_ann_save.restype = ctypes.c_int
    lib.devt_ann_load.argtypes = [ctypes.c_char_p]
    lib.devt_ann_load.restype = ctypes.c_void_p
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _f32p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_image_f32(path: str, resize: int, crop: int,
                   mean: Sequence[float], std: Sequence[float]
                   ) -> np.ndarray | None:
    """Fused decode→resize(shorter)→center-crop→normalize → (crop, crop, 3)
    f32, or None on decode failure."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    out = np.empty((crop, crop, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    rc = lib.devt_load_image_f32(path.encode(), resize, crop,
                                 _f32p(mean), _f32p(std), _f32p(out))
    return out if rc == 0 else None


def load_batch_f32(paths: Sequence[str], resize: int, crop: int,
                   mean: Sequence[float], std: Sequence[float],
                   nthreads: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Threaded batch load → ((N, crop, crop, 3) f32, (N,) status int32).

    Failed decodes leave zero images with nonzero status — the pipeline's
    missing-data fault-tolerance contract."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    n = len(paths)
    out = np.zeros((n, crop, crop, 3), np.float32)
    status = np.zeros((n,), np.int32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.devt_load_batch_f32(c_paths, n, resize, crop, _f32p(mean),
                            _f32p(std), _f32p(out),
                            status.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_int)), nthreads)
    return out, status


class AnnIndex:
    """Exact-kNN index with the Annoy usage surface the retrieval tool
    needs (add_item / build / save / load / get_nns_by_vector —
    nearest_neighbour.py:24-37)."""

    def __init__(self, dim: int, _handle=None):
        self._lib = _load()
        assert self._lib is not None, "native library unavailable"
        self.dim = dim
        self._h = _handle or self._lib.devt_ann_create(dim)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.devt_ann_destroy(self._h)
            self._h = None

    def __len__(self) -> int:
        return self._lib.devt_ann_size(self._h)

    def add_item(self, _i: int, vector: Sequence[float]) -> None:
        v = np.ascontiguousarray(vector, np.float32)
        assert v.shape == (self.dim,)
        self._lib.devt_ann_add(self._h, _f32p(v))

    def build(self, _n_trees: int = 0) -> None:
        pass  # exact index — nothing to build

    def get_nns_by_vector(self, vector: Sequence[float], k: int,
                          include_distances: bool = False):
        v = np.ascontiguousarray(vector, np.float32)
        k = min(k, len(self))
        ids = np.zeros((k,), np.int32)
        dists = np.zeros((k,), np.float32)
        self._lib.devt_ann_query(self._h, _f32p(v), k,
                                 ids.ctypes.data_as(
                                     ctypes.POINTER(ctypes.c_int)),
                                 _f32p(dists))
        if include_distances:
            return ids.tolist(), dists.tolist()
        return ids.tolist()

    def save(self, path: str) -> None:
        assert self._lib.devt_ann_save(self._h, path.encode()) == 0

    @classmethod
    def load(cls, dim: int, path: str) -> "AnnIndex":
        lib = _load()
        handle = lib.devt_ann_load(path.encode())
        assert handle, f"failed to load index {path}"
        return cls(dim, _handle=handle)
