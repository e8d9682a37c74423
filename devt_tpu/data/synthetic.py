"""Synthetic data for tests and benchmarks.

Stands in for the reference's missing fixtures (its one real test needs an
mp4 at a hardcoded home path, src/tests/test_transforms.py:11 — SURVEY.md
§4): deterministic, reference-shaped batches for every model family, plus
a fake frame-corpus generator for the pipeline tests.
"""

from __future__ import annotations

import os

import numpy as np

from devt_tpu.config import Config
from devt_tpu.registry import example_batch


class SyntheticDataModule:
    """Fixed-shape random batches shaped for ``config.model``."""

    def __init__(self, config: Config, train_size: int = 8,
                 val_size: int = 4, test_size: int = 4):
        self.config = config
        self.train_steps = max(train_size // config.batch_size, 1)
        self.val_steps = max(val_size // config.batch_size, 1)
        self.test_steps = max(test_size // config.batch_size, 1)

    def setup(self):
        return self

    def _batches(self, n, seed0):
        for i in range(n):
            cfg = self.config.replace(seed=seed0 + i)
            yield example_batch(cfg)

    def train_batches(self):
        return self._batches(self.train_steps, self.config.seed)

    def val_batches(self):
        return self._batches(self.val_steps, self.config.seed + 10_000)

    def test_batches(self):
        return self._batches(self.test_steps, self.config.seed + 20_000)


def write_fake_frame_corpus(root: str, n_movies: int = 3,
                            scenes_per_movie: int = 4,
                            frames_per_scene: int = 12,
                            size: int = 64, seed: int = 0) -> str:
    """Directory tree of PNG frames mimicking the reference's corpus layout
    (``<genre>/<movie>/<scene>/imgs/frame-*.png`` per
    src/data_processing/temporal/create_mmx_frames.py:86-95), for pipeline
    tests without real data."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    genres = ["Action", "Comedy", "Drama"]
    for m in range(n_movies):
        genre = genres[m % len(genres)]
        for s in range(scenes_per_movie):
            d = os.path.join(root, genre, f"movie{m}", f"scene{s:03d}",
                             "imgs")
            os.makedirs(d, exist_ok=True)
            for f in range(frames_per_scene):
                arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(d, f"frame-{f:04d}.png"))
    return root


def write_fake_expert_corpus(root: str, n_movies: int = 8,
                             scenes_per_movie: int = 6,
                             experts=("img-embeddings", "location-embeddings",
                                      "video-embeddings"),
                             with_test_prefix: bool = True,
                             seed: int = 0) -> tuple[str, str]:
    """Synthetic MMX-temporal corpus: .npy expert tensors + streamed-pickle
    train/val manifests with the reference's record structure
    (``{"label": [[genres]], "path": str, "scenes": {sid: {chunk:
    {expert: [paths]}}}}`` — create_mmx_temporal.py:20-81)."""
    from collections import OrderedDict

    from devt_tpu.config import MMX_GENRES_15
    from devt_tpu.data.manifests import append_pickle

    rng = np.random.default_rng(seed)
    tensor_dir = os.path.join(root, "tensors")
    os.makedirs(tensor_dir, exist_ok=True)

    def make_manifest(path: str, start: int, count: int):
        for m in range(start, start + count):
            genres = [MMX_GENRES_15[rng.integers(len(MMX_GENRES_15))],
                      MMX_GENRES_15[rng.integers(len(MMX_GENRES_15))]]
            scenes = OrderedDict()
            for s in range(scenes_per_movie):
                chunk = {}
                for e in experts:
                    dim = 2048 if "video" not in e else 512
                    t = rng.standard_normal((1, dim)).astype(np.float32)
                    tp = os.path.join(tensor_dir, f"m{m}_s{s}_{e}.npy")
                    np.save(tp, t)
                    chunk[e] = [tp]
                    if with_test_prefix:
                        chunk[f"test-{e}"] = [tp]
                scenes[f"{s:03d}"] = {"000": chunk}
            append_pickle(path, {"label": [genres],
                                 "path": f"movie{m}",
                                 "scenes": scenes})

    train = os.path.join(root, "train.pkl")
    val = os.path.join(root, "val.pkl")
    make_manifest(train, 0, n_movies)
    make_manifest(val, n_movies, max(n_movies // 2, 2))
    return train, val


def write_fake_mit_corpus(root: str, n_videos: int = 12,
                          chunks_per_video: int = 4,
                          experts=("img-embeddings", "location-embeddings"),
                          seed: int = 0) -> tuple[str, str]:
    """Synthetic MIT-temporal corpus (record = ``{"label": str, "path": str,
    "data": {cid: {expert: [paths]}}}`` — create_mit_temporal.py:26-64)."""
    from devt_tpu.data.manifests import (append_pickle,
                                         load_moments_categories)

    rng = np.random.default_rng(seed)
    labels = list(load_moments_categories().keys())[:10]
    tensor_dir = os.path.join(root, "mit_tensors")
    os.makedirs(tensor_dir, exist_ok=True)

    def make(path: str, start: int, count: int):
        for v in range(start, start + count):
            data = {}
            for c in range(chunks_per_video):
                chunk = {}
                for e in experts:
                    t = rng.standard_normal((1, 2048)).astype(np.float32)
                    tp = os.path.join(tensor_dir, f"v{v}_c{c}_{e}.npy")
                    np.save(tp, t)
                    chunk[e] = [tp]
                    chunk[f"test-{e}"] = [tp]
                data[f"{c:03d}"] = chunk
            append_pickle(path, {"label": labels[v % len(labels)],
                                 "path": f"video{v}", "data": data})

    train = os.path.join(root, "mit_train.pkl")
    val = os.path.join(root, "mit_val.pkl")
    make(train, 0, n_videos)
    make(val, n_videos, max(n_videos // 2, 2))
    return train, val


def write_fake_light_csv(root: str, n_movies: int = 4,
                         scenes_per_movie: int = 3,
                         frames_per_scene: int = 6,
                         size: int = 64, seed: int = 0) -> str:
    """Frame corpus + the ``out.csv`` (img_root, g1..g6) the MMX light
    loader reads (MMX_Light_dl.py:133-141,254-264).  Layout matches the
    light corpus: ``<img_root>/<scene>/<frame>.png`` — scene dirs directly
    under img_root, pngs directly in each scene dir."""
    import csv

    from PIL import Image

    from devt_tpu.config import MMX_GENRES_19

    rng = np.random.default_rng(seed)
    csv_path = os.path.join(root, "out.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["img_root"] + [f"g{i}" for i in range(1, 7)])
        for m in range(n_movies):
            movie_root = os.path.join(root, "light", f"movie{m}")
            for s in range(scenes_per_movie):
                d = os.path.join(movie_root, f"scene{s:03d}")
                os.makedirs(d, exist_ok=True)
                for fi in range(frames_per_scene):
                    arr = rng.integers(0, 255, (size, size, 3),
                                       dtype=np.uint8)
                    Image.fromarray(arr).save(
                        os.path.join(d, f"frame-{fi:04d}.png"))
            gs = [MMX_GENRES_19[rng.integers(len(MMX_GENRES_19))]
                  for _ in range(2)] + [""] * 4
            w.writerow([movie_root] + gs)
    return csv_path


def write_fake_mjpeg_avi(path: str, n_shots: int = 3,
                         frames_per_shot: int = 16, size: int = 96,
                         seed: int = 0) -> str:
    """Minimal MJPG-in-AVI fixture: ``n_shots`` visually distinct shots of
    ``frames_per_shot`` JPEG frames each — the missing mp4 fixture of the
    reference's only real test (src/tests/test_transforms.py:11-21),
    encodable with PIL alone and decodable by the native MJPEG path."""
    import io
    import struct

    from PIL import Image

    rng = np.random.default_rng(seed)
    jpegs = []
    for s in range(n_shots):
        base = rng.integers(0, 255, (3,))
        for f in range(frames_per_shot):
            arr = np.clip(base[None, None]
                          + rng.normal(0, 12, (size, size, 3)), 0,
                          255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=85)
            jpegs.append(buf.getvalue())

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\0" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(subtype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", subtype + payload)

    n = len(jpegs)
    avih = struct.pack("<14I", 66666, 0, 0, 0x10, n, 0, 1, 0, size, size,
                       0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"MJPG", 0, 0, 0,
                       0, 1, 15, 0, n, 0, 0xFFFFFFFF, 0, 0, 0, size, size)
    strf = struct.pack("<IiiHH4sIiiII", 40, size, size, 1, 24, b"MJPG",
                       size * size * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    return path
