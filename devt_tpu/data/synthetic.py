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
