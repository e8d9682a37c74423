"""Clip-consistent offline augmentation + per-model normalisation.

Capability twin of src/data_processing/transforms/img_transforms.py:27-141:
the reference samples one augmentation policy per *clip* and applies it to
every frame (spatio-temporally consistent crops/flips/jitter), then a
``Normaliser`` resizes/normalises per target expert model (224² for
image/location, 112² for video, 384² for depth).

cv2 is absent in this image; the kernels are PIL/numpy.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Sequence

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter

from devt_tpu.data.transforms import (IMAGENET_MEAN, IMAGENET_STD,
                                      KINETICS_MEAN, KINETICS_STD)


@dataclass
class ClipPolicy:
    """One sampled augmentation policy, applied identically to all frames
    of a clip (img_transforms.py:27-93 samples per clip, not per frame)."""
    crop_box: tuple[float, float, float, float] | None   # fractional l,t,r,b
    hflip: bool
    blur_radius: float
    noise_std: float
    brightness: float
    saturation: float
    to_gray: bool


def sample_clip_policy(rng: random.Random,
                       min_margin: float = 0.15) -> ClipPolicy:
    """Random crop keeping ≥(1-2*margin) of each side (the reference keeps
    a ≥30px margin on ~224 inputs, :27-35), flip, blur, noise, jitter,
    p-gray."""
    def frac():
        return rng.uniform(0.0, min_margin)

    crop = None
    if rng.random() < 0.8:
        l, t = frac(), frac()
        r, b = 1.0 - frac(), 1.0 - frac()
        crop = (l, t, r, b)
    return ClipPolicy(
        crop_box=crop,
        hflip=rng.random() < 0.5,
        blur_radius=rng.uniform(0.5, 1.5) if rng.random() < 0.2 else 0.0,
        noise_std=rng.uniform(2.0, 8.0) if rng.random() < 0.2 else 0.0,
        brightness=rng.uniform(0.7, 1.3) if rng.random() < 0.5 else 1.0,
        saturation=rng.uniform(0.7, 1.3) if rng.random() < 0.5 else 1.0,
        to_gray=rng.random() < 0.1,
    )


def apply_policy(frame: Image.Image, policy: ClipPolicy,
                 noise_rng: np.random.Generator | None = None
                 ) -> Image.Image:
    w, h = frame.size
    if policy.crop_box is not None:
        l, t, r, b = policy.crop_box
        frame = frame.crop((int(l * w), int(t * h), int(r * w), int(b * h)))
    if policy.hflip:
        frame = frame.transpose(Image.FLIP_LEFT_RIGHT)
    if policy.blur_radius > 0:
        frame = frame.filter(ImageFilter.GaussianBlur(policy.blur_radius))
    if policy.brightness != 1.0:
        frame = ImageEnhance.Brightness(frame).enhance(policy.brightness)
    if policy.saturation != 1.0:
        frame = ImageEnhance.Color(frame).enhance(policy.saturation)
    if policy.to_gray:
        frame = frame.convert("L").convert("RGB")
    if policy.noise_std > 0:
        rng = noise_rng or np.random.default_rng(0)
        arr = np.asarray(frame, np.float32)
        arr = arr + rng.normal(0, policy.noise_std, arr.shape)
        frame = Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))
    return frame


def augment_clip(frames: Sequence[Image.Image], rng: random.Random
                 ) -> list[Image.Image]:
    """Same sampled policy across every frame of the clip."""
    policy = sample_clip_policy(rng)
    noise_rng = np.random.default_rng(rng.randrange(2**31))
    return [apply_policy(f, policy, noise_rng) for f in frames]


class Normaliser:
    """Resize + normalise per target expert model
    (img_transforms.py:96-141): image/location → 224², video → 112²
    (Kinetics stats), depth → 384²."""

    SPECS = {
        "img": (224, IMAGENET_MEAN, IMAGENET_STD),
        "location": (224, IMAGENET_MEAN, IMAGENET_STD),
        "video": (112, KINETICS_MEAN, KINETICS_STD),
        "depth": (384, IMAGENET_MEAN, IMAGENET_STD),
    }

    def __call__(self, frame: Image.Image, model: str) -> np.ndarray:
        if model not in self.SPECS:
            raise KeyError(f"unknown target model {model!r}; "
                           f"expected one of {sorted(self.SPECS)}")
        size, mean, std = self.SPECS[model]
        frame = frame.resize((size, size), Image.BILINEAR)
        arr = np.asarray(frame, np.float32) / 255.0
        return (arr - mean) / std
