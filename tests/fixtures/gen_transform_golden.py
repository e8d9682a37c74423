"""Regenerate the committed transform goldens.

Run from the repo root:  python tests/fixtures/gen_transform_golden.py

Writes tests/fixtures/transform_fixture.png (the deterministic test
card) and tests/fixtures/transform_golden.npz — per-op golden pixels
produced by the INDEPENDENT torchvision transcription
(tests/oracle_torchvision.py), never by the production code, so the
committed bytes pin torchvision semantics, not devt_tpu behaviour.
Also pins the full production train/val stacks for fixed seeds as a
regression fence (keys prefixed ``stack_``) — those are the only
entries generated via devt_tpu.
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
from PIL import Image

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))            # tests/
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))  # repo root

import oracle_torchvision as tv  # noqa: E402

# every op × the magnitude bins the IMAGENET policy actually uses,
# plus both signs for the signed ops and the extremes
CASES = [
    ("ShearX", 5, +1), ("ShearX", 5, -1), ("ShearX", 9, +1),
    ("ShearY", 5, +1), ("ShearY", 5, -1), ("ShearY", 9, -1),
    ("TranslateX", 5, +1), ("TranslateX", 9, -1),
    ("TranslateY", 5, -1), ("TranslateY", 9, +1),
    ("Rotate", 3, +1), ("Rotate", 8, -1), ("Rotate", 9, +1),
    ("Brightness", 5, +1), ("Brightness", 5, -1),
    ("Color", 0, +1), ("Color", 2, -1), ("Color", 4, +1), ("Color", 8, -1),
    ("Contrast", 8, +1), ("Contrast", 8, -1),
    ("Sharpness", 7, +1), ("Sharpness", 7, -1),
    ("Posterize", 5, 0), ("Posterize", 6, 0), ("Posterize", 7, 0),
    ("Posterize", 8, 0),
    ("Solarize", 3, 0), ("Solarize", 4, 0), ("Solarize", 5, 0),
    ("Solarize", 7, 0), ("Solarize", 8, 0),
    ("AutoContrast", None, 0), ("Equalize", None, 0), ("Invert", None, 0),
]


def case_key(op, bin_idx, sign):
    s = {1: "pos", -1: "neg", 0: ""}[sign]
    return f"{op}_b{bin_idx}_{s}".rstrip("_")


def main():
    img = tv.fixture_image()
    img.save(os.path.join(HERE, "transform_fixture.png"))

    out = {"fixture": np.asarray(img, np.uint8)}
    for op, bin_idx, sign in CASES:
        mag = tv.tv_magnitude(op, bin_idx, (img.size[1], img.size[0])) \
            if bin_idx is not None else 0.0
        mag *= (sign if sign else 1)
        out[case_key(op, bin_idx, sign)] = np.asarray(
            tv.tv_apply_op(img, op, mag), np.uint8)

    # production full-stack regression pins (the one devt_tpu-derived set)
    from devt_tpu.data import transforms as T

    big = tv.fixture_image(w=283, h=311, seed=9)
    out["stack_val"] = T.val_image_transform(big)
    for seed in (0, 1, 2, 3):
        out[f"stack_train_s{seed}"] = T.train_image_transform(
            big, random.Random(seed), size=64)

    np.savez_compressed(os.path.join(HERE, "transform_golden.npz"), **out)
    print(f"wrote {len(out)} golden arrays")


if __name__ == "__main__":
    main()
