"""Manifest builders: corpus tree → append-streamed pickle manifests.

Capability twins of the reference's five builder scripts
(src/data_processing/temporal/create_mmx_temporal.py,
create_mmx_frames.py, create_mit_temporal.py and
src/data_processing/contrastive/create_{mmx,mit}_contrastive.py),
with the ``mp.Pool(30).imap`` fan-out pattern
(create_mmx_temporal.py:177-207) behind one :func:`process_map` utility.

Canonical corpus layout (what the extraction tooling writes and the
synthetic generators mimic):

    <root>/<genre>/<movie>/<scene>/imgs/frame-*.png     (frames)
    <root>/<genre>/<movie>/<scene>/<expert>.npy         (expert embeddings)

Records match the structures the datamodules consume — see
devt_tpu/data/manifests.py.
"""

from __future__ import annotations

import glob
import os
import re
from collections import OrderedDict
from multiprocessing.pool import ThreadPool
from typing import Callable, Iterable, Sequence

import numpy as np

from devt_tpu.data.manifests import append_pickle

_NUM_RE = re.compile(r"(\d+)")


def numeric_sort(paths: Iterable[str]) -> list[str]:
    """Sort by embedded numeric components (the reference's regex-numeric
    scene sort, create_mmx_temporal.py:20-40)."""
    def key(p):
        return [int(t) if t.isdigit() else t for t in _NUM_RE.split(p)]
    return sorted(paths, key=key)


def process_map(fn: Callable, items: Sequence, workers: int = 8,
                ordered: bool = True):
    """Pool.imap-style fan-out (the reference's ``mp.Pool(30).imap``,
    create_mmx_temporal.py:177-207).  A thread pool: the builder work is
    IO-bound directory walking, and threads keep closures picklability-free
    (the reference needed ``file_system`` sharing workarounds for its
    process pool, create_mmx_temporal.py:210-212)."""
    if workers <= 1:
        return [fn(it) for it in items]
    with ThreadPool(workers) as pool:
        mapper = pool.imap if ordered else pool.imap_unordered
        return list(mapper(fn, items))


def _movie_dirs(root: str) -> list[tuple[str, str, str]]:
    """[(genre, movie_name, movie_dir)] under the canonical layout."""
    out = []
    for genre in sorted(os.listdir(root)):
        gdir = os.path.join(root, genre)
        if not os.path.isdir(gdir):
            continue
        for movie in sorted(os.listdir(gdir)):
            mdir = os.path.join(gdir, movie)
            if os.path.isdir(mdir):
                out.append((genre, movie, mdir))
    return out


def _scene_expert_record(mdir: str, experts: Sequence[str]) -> OrderedDict:
    """scenes → {"000": {expert: [paths]}} (create_mmx_temporal.py:20-81)."""
    scenes: OrderedDict = OrderedDict()
    for si, scene_dir in enumerate(numeric_sort(
            d for d in glob.glob(os.path.join(mdir, "*"))
            if os.path.isdir(d))):
        chunk = {}
        for expert in experts:
            paths = numeric_sort(glob.glob(
                os.path.join(scene_dir, f"{expert}*.npy")))
            if paths:
                chunk[expert] = paths
        if chunk:
            scenes[f"{si:03d}"] = {"000": chunk}
    return scenes


def build_mmx_temporal(corpus_root: str, out_train: str, out_val: str,
                       experts: Sequence[str], split: float = 0.9,
                       workers: int = 8) -> tuple[int, int]:
    """Expert-sequence manifests with a 90/10 split
    (create_mmx_temporal.py:165-207)."""
    movies = _movie_dirs(corpus_root)

    def record(args):
        genre, movie, mdir = args
        scenes = _scene_expert_record(mdir, experts)
        return {"label": [[genre]], "path": os.path.join(genre, movie),
                "scenes": scenes}

    records = process_map(record, movies, workers)
    records = [r for r in records if r["scenes"]]
    n_train = int(len(records) * split)
    for r in records[:n_train]:
        append_pickle(out_train, r)
    for r in records[n_train:]:
        append_pickle(out_val, r)
    return n_train, len(records) - n_train


def build_mmx_frames(corpus_root: str, out_train: str, out_val: str,
                     min_frames: int = 10, pad_to: int = 16,
                     split: float = 0.9, workers: int = 8
                     ) -> tuple[int, int]:
    """Frame-path manifests: per scene, ≥``min_frames`` frames numeric-
    sorted and repeat-padded to ``pad_to`` paths
    (create_mmx_frames.py:86-95)."""
    movies = _movie_dirs(corpus_root)

    def record(args):
        genre, movie, mdir = args
        scenes: OrderedDict = OrderedDict()
        for si, scene_dir in enumerate(numeric_sort(
                d for d in glob.glob(os.path.join(mdir, "*"))
                if os.path.isdir(d))):
            frames = numeric_sort(
                glob.glob(os.path.join(scene_dir, "imgs", "*")))
            if len(frames) < min_frames:
                continue
            while len(frames) < pad_to:
                frames.append(frames[-1])
            scenes[f"{si:03d}"] = {0: frames[:max(pad_to, len(frames))]}
        return {"label": [genre], "path": os.path.join(genre, movie),
                "scenes": scenes}

    records = [r for r in process_map(record, movies, workers)
               if r["scenes"]]
    n_train = int(len(records) * split)
    for r in records[:n_train]:
        append_pickle(out_train, r)
    for r in records[n_train:]:
        append_pickle(out_val, r)
    return n_train, len(records) - n_train


def build_mit_temporal(corpus_root: str, out_path: str,
                       experts: Sequence[str], workers: int = 8) -> int:
    """MIT manifests (create_mit_temporal.py:26-89): layout
    ``<root>/<label>/<video>/<chunk>/<expert>.npy``; record = {"label",
    "path", "data": {chunk: {expert: [paths]}}}."""
    videos = []
    for label in sorted(os.listdir(corpus_root)):
        ldir = os.path.join(corpus_root, label)
        if not os.path.isdir(ldir):
            continue
        for video in sorted(os.listdir(ldir)):
            vdir = os.path.join(ldir, video)
            if os.path.isdir(vdir):
                videos.append((label, video, vdir))

    def record(args):
        label, video, vdir = args
        data: OrderedDict = OrderedDict()
        for ci, chunk_dir in enumerate(numeric_sort(
                d for d in glob.glob(os.path.join(vdir, "*"))
                if os.path.isdir(d))):
            chunk = {}
            for expert in experts:
                paths = numeric_sort(glob.glob(
                    os.path.join(chunk_dir, f"{expert}*.npy")))
                if paths:
                    chunk[expert] = paths
            if chunk:
                data[f"{ci:03d}"] = chunk
        return {"label": label, "path": os.path.join(label, video),
                "data": data}

    records = [r for r in process_map(record, videos, workers) if r["data"]]
    for r in records:
        append_pickle(out_path, r)
    return len(records)


def build_mmx_contrastive(corpus_root: str, out_train: str, out_val: str,
                          experts: Sequence[str], split: float = 0.9,
                          workers: int = 8) -> tuple[int, int]:
    """Scene-level contrastive manifests
    (create_mmx_contrastive.py:69-198): same record shape as the temporal
    manifest — the pair sampling happens at load time."""
    return build_mmx_temporal(corpus_root, out_train, out_val, experts,
                              split, workers)


def build_mit_contrastive(corpus_root: str, out_path: str,
                          experts: Sequence[str], workers: int = 8,
                          shuffle_seed: int | None = 0) -> int:
    """MIT contrastive training manifest
    (create_mit_contrastive.py:14-77): layout
    ``<root>/<label>/<video>/<chunk>/<expert>.npy``; record = {"path",
    "label", "data": {chunk: {expert: [paths]}}} — the chunk-pair sampling
    happens at load time (ContrastivePairDataset).  The reference shuffles
    the video list before the streamed dump (create_mit_contrastive.py:73);
    ``shuffle_seed=None`` disables."""
    import random as _random

    videos = []
    for label in sorted(os.listdir(corpus_root)):
        ldir = os.path.join(corpus_root, label)
        if not os.path.isdir(ldir):
            continue
        for video in sorted(os.listdir(ldir)):
            vdir = os.path.join(ldir, video)
            if os.path.isdir(vdir):
                videos.append((label, video, vdir))
    if shuffle_seed is not None:
        _random.Random(shuffle_seed).shuffle(videos)

    def record(args):
        label, video, vdir = args
        data: OrderedDict = OrderedDict()
        for chunk_dir in numeric_sort(
                d for d in glob.glob(os.path.join(vdir, "*"))
                if os.path.isdir(d)):
            chunk = {}
            for expert in experts:
                paths = numeric_sort(glob.glob(
                    os.path.join(chunk_dir, f"{expert}*.npy")))
                if paths:
                    # >1 stored tensors → list (random choice at load);
                    # exactly 1 → single-element list, like the reference
                    chunk[expert] = paths
            if chunk:
                data[os.path.basename(chunk_dir.rstrip("/"))] = chunk
        return {"path": vdir, "label": label, "data": data}

    records = [r for r in process_map(record, videos, workers) if r["data"]]
    for r in records:
        append_pickle(out_path, r)
    return len(records)


def extract_experts(corpus_root: str, experts: Sequence[str],
                    extractor=None, frames_per_scene: int = 8) -> int:
    """Run the frozen expert extractors over every scene's frames and write
    ``<scene>/<expert>.npy`` (the offline role of
    src/models/pretrained/models.py:27-122).  Returns scenes processed."""
    from PIL import Image

    from devt_tpu.data_processing.img_transforms import Normaliser
    from devt_tpu.models.pretrained import EmbeddingExtractor

    extractor = extractor or EmbeddingExtractor()
    norm = Normaliser()
    count = 0
    for genre, movie, mdir in _movie_dirs(corpus_root):
        for scene_dir in sorted(
                d for d in glob.glob(os.path.join(mdir, "*"))
                if os.path.isdir(d)):
            frames = numeric_sort(glob.glob(
                os.path.join(scene_dir, "imgs", "*")))[:frames_per_scene]
            if not frames:
                continue
            pil = [Image.open(f).convert("RGB") for f in frames]
            for expert in experts:
                if expert.startswith("img"):
                    batch = np.stack([norm(p, "img") for p in pil])
                    emb = extractor.return_expert_for_key("image", batch)
                elif expert.startswith("location"):
                    batch = np.stack([norm(p, "location") for p in pil])
                    emb = extractor.return_expert_for_key("location", batch)
                elif expert.startswith("video"):
                    clip = np.stack([norm(p, "video") for p in pil])[None]
                    emb = extractor.return_expert_for_key("video", clip)
                else:
                    continue
                np.save(os.path.join(scene_dir, f"{expert}.npy"),
                        np.asarray(emb, np.float32)[None, :])
            count += 1
    return count
