"""Independent transcription of torchvision's PIL transform lowering.

torchvision is NOT installable in this zero-egress image (torch is; the
torchvision wheel is absent from the package index mirror), so pixel-level
ground truth for the reference's transform stack
(/root/reference/src/dataloaders/mmx/MMX_Frame_dl.py:63-96 constructs
``transforms.AutoAugment()`` / ``Resize`` / ``CenterCrop`` /
``RandomResizedCrop`` with all-default arguments) is established the same
way the pretrained-port suite does it: an independent transcription of the
library's documented execution path, written directly from torchvision's
published source semantics (transforms/autoaugment.py `_apply_op` +
`_augmentation_space`, transforms/functional.py `affine`/`rotate`/`resize`,
functional_pil.py) — NOT derived from devt_tpu's production code.  The
production implementations in devt_tpu/data/transforms.py use
hand-specialized affine matrices and integer magnitude arithmetic; this
oracle recomputes every op through torchvision's general formulas
(`_get_inverse_affine_matrix` with its center/translate composition,
float `linspace` magnitude tables, float solarize thresholds), so
agreement is a genuine two-path check, pixel-exact.

Used by tests/test_transform_golden.py and by
tests/fixtures/gen_transform_golden.py (the committed-golden generator).
"""

from __future__ import annotations

import math

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

_BLACK = (0, 0, 0)


# ---------------------------------------------------------------------------
# torchvision/transforms/functional.py:_get_inverse_affine_matrix —
# full transcription (the PIL path passes `center` in absolute pixel
# coordinates; only the tensor path re-centers)
# ---------------------------------------------------------------------------


def inverse_affine_matrix(center, angle, translate, scale, shear):
    rot = math.radians(angle)
    sx = math.radians(shear[0])
    sy = math.radians(shear[1])
    cx, cy = center
    tx, ty = translate

    # RSS without scaling
    a = math.cos(rot - sy) / math.cos(sy)
    b = -math.cos(rot - sy) * math.tan(sx) / math.cos(sy) - math.sin(rot)
    c = math.sin(rot - sy) / math.cos(sy)
    d = -math.sin(rot - sy) * math.tan(sx) / math.cos(sy) + math.cos(rot)

    # inverted rotation matrix with scale and shear:
    # RSS(a, b, c, d)^-1 = 1/scale * [d, -b; -c, a]
    matrix = [d, -b, 0.0, -c, a, 0.0]
    matrix = [x / scale for x in matrix]
    # apply inverse of translation and of center translation:
    # RSS^-1 * C^-1 * T^-1
    matrix[2] += matrix[0] * (-cx - tx) + matrix[1] * (-cy - ty)
    matrix[5] += matrix[3] * (-cx - tx) + matrix[4] * (-cy - ty)
    # apply center translation: C * RSS^-1 * C^-1 * T^-1
    matrix[2] += cx
    matrix[5] += cy
    return matrix


def tv_affine(img, angle=0.0, translate=(0, 0), scale=1.0,
              shear=(0.0, 0.0), center=None):
    """functional.affine, PIL path, InterpolationMode.NEAREST, fill=None
    (functional_pil._parse_fill(None) → per-channel 0)."""
    w, h = img.size
    if center is None:
        center = [w * 0.5, h * 0.5]
    matrix = inverse_affine_matrix(center, angle, list(map(float,
                                                           translate)),
                                   scale, shear)
    return img.transform((w, h), Image.AFFINE, matrix, Image.NEAREST,
                         fillcolor=_BLACK)


# ---------------------------------------------------------------------------
# transforms/autoaugment.py — _augmentation_space(num_bins=10) magnitude
# tables and _apply_op lowering, AutoAugment() defaults
# ---------------------------------------------------------------------------


def tv_magnitude(op: str, bin_idx: int, img_size) -> float:
    """float(magnitudes[bin_idx]) from _augmentation_space(10, (H, W))."""
    h, w = img_size
    spaces = {
        "ShearX": np.linspace(0.0, 0.3, 10),
        "ShearY": np.linspace(0.0, 0.3, 10),
        "TranslateX": np.linspace(0.0, 150.0 / 331.0 * w, 10),
        "TranslateY": np.linspace(0.0, 150.0 / 331.0 * h, 10),
        "Rotate": np.linspace(0.0, 30.0, 10),
        "Brightness": np.linspace(0.0, 0.9, 10),
        "Color": np.linspace(0.0, 0.9, 10),
        "Contrast": np.linspace(0.0, 0.9, 10),
        "Sharpness": np.linspace(0.0, 0.9, 10),
        "Posterize": 8 - np.round(np.arange(10) / (9 / 4)),
        "Solarize": np.linspace(255.0, 0.0, 10),
    }
    if op not in spaces:
        return 0.0
    return float(spaces[op][bin_idx])


def tv_apply_op(img: Image.Image, op: str, magnitude: float) -> Image.Image:
    """autoaugment._apply_op with interpolation=NEAREST, fill=None."""
    if op == "ShearX":
        return tv_affine(img, shear=(math.degrees(math.atan(magnitude)),
                                     0.0), center=[0, 0])
    if op == "ShearY":
        return tv_affine(img, shear=(0.0,
                                     math.degrees(math.atan(magnitude))),
                         center=[0, 0])
    if op == "TranslateX":
        return tv_affine(img, translate=(int(magnitude), 0))
    if op == "TranslateY":
        return tv_affine(img, translate=(0, int(magnitude)))
    if op == "Rotate":
        # functional_pil.rotate: img.rotate(angle, NEAREST, expand=False,
        # center=None, fillcolor=parse_fill(None))
        return img.rotate(magnitude, Image.NEAREST, fillcolor=_BLACK)
    if op == "Brightness":
        return ImageEnhance.Brightness(img).enhance(1.0 + magnitude)
    if op == "Color":
        return ImageEnhance.Color(img).enhance(1.0 + magnitude)
    if op == "Contrast":
        return ImageEnhance.Contrast(img).enhance(1.0 + magnitude)
    if op == "Sharpness":
        return ImageEnhance.Sharpness(img).enhance(1.0 + magnitude)
    if op == "Posterize":
        return ImageOps.posterize(img, int(magnitude))
    if op == "Solarize":
        # float threshold straight from the linspace: invert i >= t
        lut = [i if i < magnitude else 255 - i for i in range(256)]
        return img.point(lut * len(img.getbands()))
    if op == "AutoContrast":
        return ImageOps.autocontrast(img)
    if op == "Equalize":
        return ImageOps.equalize(img)
    if op == "Invert":
        return ImageOps.invert(img)
    raise ValueError(op)


# torchvision AutoAugmentPolicy.IMAGENET (autoaugment.py _get_policies),
# transcribed from the published table
TV_IMAGENET_POLICY = [
    (("Posterize", 0.4, 8), ("Rotate", 0.6, 9)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, None)),
    (("Equalize", 0.8, None), ("Equalize", 0.6, None)),
    (("Posterize", 0.6, 7), ("Posterize", 0.6, 6)),
    (("Equalize", 0.4, None), ("Solarize", 0.2, 4)),
    (("Equalize", 0.4, None), ("Rotate", 0.8, 8)),
    (("Solarize", 0.6, 3), ("Equalize", 0.6, None)),
    (("Posterize", 0.8, 5), ("Equalize", 1.0, None)),
    (("Rotate", 0.2, 3), ("Solarize", 0.6, 8)),
    (("Equalize", 0.6, None), ("Posterize", 0.4, 6)),
    (("Rotate", 0.8, 8), ("Color", 0.4, 0)),
    (("Rotate", 0.4, 9), ("Equalize", 0.6, None)),
    (("Equalize", 0.0, None), ("Equalize", 0.8, None)),
    (("Invert", 0.6, None), ("Equalize", 1.0, None)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Rotate", 0.8, 8), ("Color", 1.0, 2)),
    (("Color", 0.8, 8), ("Solarize", 0.8, 7)),
    (("Sharpness", 0.4, 7), ("Invert", 0.6, None)),
    (("ShearX", 0.6, 5), ("Equalize", 1.0, None)),
    (("Color", 0.4, 0), ("Equalize", 0.6, None)),
    (("Equalize", 0.4, None), ("Solarize", 0.2, 4)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, None)),
    (("Invert", 0.6, None), ("Equalize", 1.0, None)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Equalize", 0.8, None), ("Equalize", 0.6, None)),
]


# ---------------------------------------------------------------------------
# transforms/functional_pil.py resize / center_crop formulas
# ---------------------------------------------------------------------------


def tv_resize_shorter_size(w: int, h: int, size: int):
    """F_pil.resize(int): (new_w, new_h); the long side truncates."""
    short, long = (w, h) if w <= h else (h, w)
    new_short, new_long = size, int(size * long / short)
    return (new_short, new_long) if w <= h else (new_long, new_short)


def tv_center_crop_box(w: int, h: int, size: int):
    """functional.center_crop offsets: round-half-away int rounding."""
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return left, top


def fixture_image(w: int = 97, h: int = 61, seed: int = 7) -> Image.Image:
    """Deterministic photo-like RGB test card: smooth gradients, hard
    edges, a bright disc, and seeded texture — non-square so W/H swaps
    show up, content at the borders so affine fills are exercised."""
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 96 + 128 * x / w + 24 * np.sin(y / 3.0)
    g = 64 + 160 * y / h
    b = 200 - 130 * (x + y) / (w + h)
    img = np.stack([r, g, b], axis=-1)
    cy, cx = h * 0.35, w * 0.6
    disc = ((y - cy) ** 2 + (x - cx) ** 2) < (min(h, w) * 0.22) ** 2
    img[disc] = [250, 240, 90]
    img[h // 2:h // 2 + 3, :] = [10, 10, 10]
    img[:, w // 3:w // 3 + 2] = [240, 30, 30]
    rng = np.random.default_rng(seed)
    img += rng.normal(0.0, 6.0, img.shape)
    return Image.fromarray(np.clip(img, 0, 255).astype(np.uint8), "RGB")
