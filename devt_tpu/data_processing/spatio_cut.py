"""SpatioCut — video → fixed-length shot chunks.

Capability twin of src/data_processing/transforms/spatio_cut.py:11-47: the
reference shells out to ffmpeg to re-rate a video and segment it into
1-second/16-frame GOP-aligned chunks with forced keyframes, then extracts
frames with cv2.  This environment ships neither an ffmpeg binary nor cv2,
so the capability splits:

  * :func:`cut_vid` — the full pipeline on an already-decoded frame array
    (``(T, H, W, C) uint8``) or a directory of frame images: optional
    content-based shot detection (normalised RGB-histogram distance, the
    classic shot-boundary signal), then chunking into exactly
    ``frames_per_chunk``-frame chunks (trailing partial chunk dropped —
    matching the segmenter's whole-chunk output).
  * :func:`cut_video_file` — when an ``ffmpeg`` binary *is* present, the
    reference's decode path: re-rate to ``fps``, dump frames, then chunk.
    Raises a clear error otherwise.

Returns ``[n_chunks][frames_per_chunk]`` frame arrays, the reference's
return contract (spatio_cut.py:36-47; its test asserts 3 chunks × 16
frames, src/tests/test_transforms.py:13-21).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Sequence

import numpy as np


def _histogram(frame: np.ndarray, bins: int = 32) -> np.ndarray:
    hists = [np.histogram(frame[..., c], bins=bins, range=(0, 255))[0]
             for c in range(frame.shape[-1])]
    h = np.concatenate(hists).astype(np.float64)
    return h / max(h.sum(), 1)


def detect_shot_boundaries(frames: np.ndarray,
                           threshold: float = 0.35) -> list[int]:
    """Indices where a new shot starts (histogram-distance spikes)."""
    bounds = [0]
    prev = _histogram(frames[0])
    for i in range(1, len(frames)):
        cur = _histogram(frames[i])
        dist = 0.5 * np.abs(cur - prev).sum()
        if dist > threshold:
            bounds.append(i)
        prev = cur
    return bounds


def _chunk(frames: np.ndarray, n: int) -> list[list[np.ndarray]]:
    chunks = []
    for start in range(0, len(frames) - n + 1, n):
        chunks.append([frames[start + k] for k in range(n)])
    return chunks


class SpatioCut:
    """Shot cutter with the reference's ``cut_vid`` surface."""

    def __init__(self, fps: int = 16, shot_threshold: float = 0.35):
        self.fps = fps
        self.shot_threshold = shot_threshold

    def load_frames(self, source) -> np.ndarray:
        """Accepts an array (T,H,W,C), a directory of frames, or a list of
        image paths."""
        if isinstance(source, np.ndarray):
            return source
        from PIL import Image

        if isinstance(source, (list, tuple)):
            paths = list(source)
        else:
            paths = sorted(
                os.path.join(source, f) for f in os.listdir(source)
                if f.lower().endswith((".png", ".jpg", ".jpeg")))
        return np.stack([np.asarray(Image.open(p).convert("RGB"))
                         for p in paths])

    def cut_vid(self, source, frames_per_chunk: int = 16,
                shot_aware: bool = False) -> list[list[np.ndarray]]:
        """Segment into whole ``frames_per_chunk``-frame chunks.

        ``shot_aware=True`` restarts chunking at detected shot boundaries
        (so chunks never straddle a cut — the forced-keyframe intent of the
        reference's ffmpeg flags, spatio_cut.py:15-22)."""
        frames = self.load_frames(source)
        if not shot_aware:
            return _chunk(frames, frames_per_chunk)
        chunks: list[list[np.ndarray]] = []
        bounds = detect_shot_boundaries(frames, self.shot_threshold)
        bounds.append(len(frames))
        for s, e in zip(bounds[:-1], bounds[1:]):
            chunks.extend(_chunk(frames[s:e], frames_per_chunk))
        return chunks

    # ------------------------------------------------------------------
    def cut_video_file(self, video_path: str, frames_per_chunk: int = 16,
                       shot_aware: bool = False) -> list[list[np.ndarray]]:
        """Video-file decode path (the reference's ffmpeg role,
        spatio_cut.py:11-22).

        MJPEG streams and MJPG-in-AVI files decode natively through the
        C++ library (devt_tpu/native.py — no external binary needed);
        other codecs fall back to an ``ffmpeg`` binary when one is on
        PATH."""
        from devt_tpu import native

        if native.available() and video_path.lower().endswith(
                (".avi", ".mjpeg", ".mjpg")):
            frames = native.load_video_rgb8(video_path)
            if frames is not None:
                return self.cut_vid(frames, frames_per_chunk,
                                    shot_aware=shot_aware)
        ffmpeg = shutil.which("ffmpeg")
        if ffmpeg is None:
            raise RuntimeError(
                "no native decoder for this container and no ffmpeg binary "
                "— decode externally and pass frames (array/dir) to "
                "cut_vid() instead")
        with tempfile.TemporaryDirectory() as tmp:
            subprocess.run(
                [ffmpeg, "-y", "-i", video_path, "-r", str(self.fps),
                 "-f", "image2", os.path.join(tmp, "f-%05d.png")],
                check=True, capture_output=True)
            return self.cut_vid(tmp, frames_per_chunk)
