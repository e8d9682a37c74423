"""On-device dequantize+normalize for the uint8 wire format.

The reference normalizes pixels on the host inside DataLoader workers
(torchvision Normalize, src/dataloaders/mmx/MMX_Light_dl.py:207-216) and
ships float tensors to the GPU.  On TPU hosts the host→device link — PCIe
on a real pod host, a tunnel here — is the e2e input bottleneck, so the
TPU-native layout ships the decoded pixels as uint8 (4x fewer bytes than
f32) and folds ``(v/255 - mean)/std`` into the device program, where it is
a single fused multiply-add XLA merges into the first consumer.

Numerics: the native decoder's resize rounds to uint8 either way
(native/devt_host.cpp resize_bilinear), so the u8 wire carries exactly the
bytes the host f32 path would normalize — no extra quantization.

Keys are mapped to the same constant sets the host packer uses
(data/transforms.py): ``vid`` → Kinetics, ``img`` → ImageNet.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from devt_tpu.data import transforms

_NORM_BY_KEY = {
    "vid": (transforms.KINETICS_MEAN, transforms.KINETICS_STD),
    "img": (transforms.IMAGENET_MEAN, transforms.IMAGENET_STD),
}


def dequantize(x, mean: np.ndarray, std: np.ndarray, dtype=jnp.bfloat16):
    """uint8 HWC pixels → normalized ``dtype``: one fused multiply-add.

    ``x * (1/(255*std)) + (-mean/std)`` — algebraically identical to the
    host path's ``(x/255 - mean)/std``."""
    scale = (1.0 / (255.0 * std)).astype(np.float32)
    bias = (-mean / std).astype(np.float32)
    return x.astype(dtype) * jnp.asarray(scale, dtype) \
        + jnp.asarray(bias, dtype)


def maybe_dequantize_batch(batch: dict, dtype=jnp.bfloat16) -> dict:
    """Return ``batch`` with any uint8 ``vid``/``img``/``vid_tokens``
    leaves normalized on device; float leaves pass through untouched.

    ``vid_tokens`` is the pre-patchified layout (..., N, p*p*c) with c
    fastest (models/vivit.py patchify): the per-channel constants tile to
    a per-lane (p*p*c,) vector — still one fused multiply-add."""
    out = dict(batch)
    for key, (mean, std) in _NORM_BY_KEY.items():
        v = out.get(key)
        if v is not None and v.dtype == jnp.uint8:
            out[key] = dequantize(v, mean, std, dtype=dtype)
    tok = out.get("vid_tokens")
    if tok is not None and tok.dtype == jnp.uint8:
        mean, std = _NORM_BY_KEY["vid"]
        reps = tok.shape[-1] // mean.shape[-1]
        out["vid_tokens"] = dequantize(tok, np.tile(mean, reps),
                                       np.tile(std, reps), dtype=dtype)
    return out
