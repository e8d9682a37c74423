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

    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.devt_load_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, u8p, i32p, ctypes.c_int]
    lib.devt_load_batch_u8.restype = ctypes.c_int
    lib.devt_load_batch_u8_patches.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, u8p, i32p, ctypes.c_int]
    lib.devt_load_batch_u8_patches.restype = ctypes.c_int
    lib.devt_video_info.argtypes = [ctypes.c_char_p, i32p, i32p, i32p]
    lib.devt_video_info.restype = ctypes.c_int
    lib.devt_video_decode_rgb8.argtypes = [
        ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.devt_video_decode_rgb8.restype = ctypes.c_int
    lib.devt_video_decode_f32.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p,
        ctypes.c_int, ctypes.c_int]
    lib.devt_video_decode_f32.restype = ctypes.c_int

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


def _out_buffer(out: np.ndarray | None, shape: tuple, dtype) -> np.ndarray:
    """Caller-provided decode target (e.g. a batch slot view — the
    Loader fill-into contract, data/pipeline.py): the C++ decoder then
    writes the wire bytes STRAIGHT into their final batch position, no
    intermediate sample buffer.  Must be C-contiguous and exact-shaped;
    zero-initialised here because the decoder leaves failed slots
    untouched beyond its own zero-fill contract."""
    if out is None:
        return np.zeros(shape, dtype)
    assert out.shape == shape and out.dtype == np.dtype(dtype), \
        (out.shape, out.dtype, shape, dtype)
    assert out.flags["C_CONTIGUOUS"], "out must be C-contiguous"
    out[...] = 0
    return out


def load_batch_f32(paths: Sequence[str], resize: int, crop: int,
                   mean: Sequence[float], std: Sequence[float],
                   nthreads: int | None = None, out: np.ndarray | None = None
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Threaded batch load → ((N, crop, crop, 3) f32, (N,) status int32).

    ``nthreads`` defaults to the host core count (capped at 8) — spawning
    more threads than cores measurably hurts on small hosts.

    Failed decodes leave zero images with nonzero status — the pipeline's
    missing-data fault-tolerance contract."""
    if nthreads is None:
        nthreads = min(8, os.cpu_count() or 1)
    lib = _load()
    assert lib is not None, "native library unavailable"
    n = len(paths)
    out = _out_buffer(out, (n, crop, crop, 3), np.float32)
    status = np.zeros((n,), np.int32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.devt_load_batch_f32(c_paths, n, resize, crop, _f32p(mean),
                            _f32p(std), _f32p(out),
                            status.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_int)), nthreads)
    return out, status


def load_batch_u8(paths: Sequence[str], resize: int, crop: int,
                  nthreads: int | None = None, out: np.ndarray | None = None
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Threaded batch load, u8 wire format → ((N, crop, crop, 3) u8,
    (N,) status int32).

    Same decode→resize→crop as :func:`load_batch_f32` but normalization
    is deferred to the accelerator (``devt_tpu.data.device_norm``): the
    resize already rounds to uint8 internally, so these bytes are exactly
    the pixels the f32 path normalizes, while the host→device transfer
    moves 4x fewer bytes."""
    if nthreads is None:
        nthreads = min(8, os.cpu_count() or 1)
    lib = _load()
    assert lib is not None, "native library unavailable"
    n = len(paths)
    out = _out_buffer(out, (n, crop, crop, 3), np.uint8)
    status = np.zeros((n,), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.devt_load_batch_u8(c_paths, n, resize, crop,
                           out.ctypes.data_as(
                               ctypes.POINTER(ctypes.c_uint8)),
                           status.ctypes.data_as(
                               ctypes.POINTER(ctypes.c_int)), nthreads)
    return out, status


def load_batch_u8_patches(paths: Sequence[str], resize: int, crop: int,
                          patch: int, nthreads: int | None = None,
                          out: np.ndarray | None = None
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Threaded batch load, pre-patchified u8 wire →
    ((N, (crop/patch)**2, patch*patch*3) u8 tokens, (N,) status int32).

    Byte-identical pixels to :func:`load_batch_u8`, emitted in the ViT
    token layout (``models/vivit.py patchify`` order: p1, p2, c) so the
    device step replaces the conv patch embed with one clean matmul.
    The permutation is free at decode time; failed decodes zero-fill and
    report nonzero status (callers mean-fill like the pixel wire)."""
    if nthreads is None:
        nthreads = min(8, os.cpu_count() or 1)
    lib = _load()
    assert lib is not None, "native library unavailable"
    assert crop % patch == 0, (crop, patch)
    n = len(paths)
    g = crop // patch
    out = _out_buffer(out, (n, g * g, patch * patch * 3), np.uint8)
    status = np.zeros((n,), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.devt_load_batch_u8_patches(
        c_paths, n, resize, crop, patch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), nthreads)
    assert rc == 0, f"devt_load_batch_u8_patches rc={rc}"
    return out, status


def video_info(path: str) -> tuple[int, int, int] | None:
    """(n_frames, width, height) of an MJPEG/.avi video, or None."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    n = ctypes.c_int()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.devt_video_info(path.encode(), ctypes.byref(n),
                             ctypes.byref(w), ctypes.byref(h))
    return (n.value, w.value, h.value) if rc == 0 else None


def load_video_rgb8(path: str, max_frames: int = 1 << 16,
                    nthreads: int | None = None) -> np.ndarray | None:
    """Decode an MJPEG/.avi video → (N, H, W, 3) uint8 (the ffmpeg-decode
    role of the reference's shot pipeline, spatio_cut.py:11-33)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    info = video_info(path)
    if info is None:
        return None
    n, w, h = info
    n = min(n, max_frames)
    out = np.zeros((n, h, w, 3), np.uint8)
    if nthreads is None:
        nthreads = min(8, os.cpu_count() or 1)
    got = lib.devt_video_decode_rgb8(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, w, h, nthreads)
    return out[:got] if got > 0 else None


def load_video_f32(path: str, resize: int, crop: int,
                   mean: Sequence[float], std: Sequence[float],
                   max_frames: int = 1 << 16,
                   nthreads: int | None = None) -> np.ndarray | None:
    """Fused video decode→resize→crop→normalize → (N, crop, crop, 3) f32."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    info = video_info(path)
    if info is None:
        return None
    n = min(info[0], max_frames)
    out = np.zeros((n, crop, crop, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    if nthreads is None:
        nthreads = min(8, os.cpu_count() or 1)
    got = lib.devt_video_decode_f32(path.encode(), resize, crop,
                                    _f32p(mean), _f32p(std), _f32p(out),
                                    n, nthreads)
    return out[:got] if got > 0 else None


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
