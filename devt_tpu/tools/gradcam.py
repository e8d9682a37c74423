"""Grad-CAM for the conv backbones.

Capability twin of the reference's ``pytorch_grad_cam`` usage: it imports
GradCAM/ScoreCAM/…​ (src/main.py:20-22, src/models/frame_transformer.py:
14-16) and carries a commented visualisation block targeting
``vid_model.backbone.layer4[-1]`` (src/main.py:95-108).

Implemented the JAX way: the class-score gradient w.r.t. an intermediate
stage activation comes from one ``jax.grad`` through a function that
re-runs the head from that activation — no hooks, no graph surgery.

``gradcam_resnet`` targets the last stage (layer4) of the 2D ResNet;
``show_cam_on_image`` reproduces the overlay helper.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gradcam_resnet(model, variables, images, class_idx,
                   head_fn=None):
    """CAM heatmaps for a devt_tpu ResNet (models/resnet.py).

    images: (B, H, W, C); class_idx: int or (B,).  ``head_fn(pooled)``
    maps pooled features → logits; defaults to the model's own fc when the
    model was built with ``output="logits"``.

    Returns (B, H/32, W/32) heatmaps in [0, 1] — upsample to taste.
    """
    stages_model = model.clone(output="stages")

    # dS/dA: run the trunk once to get the layer4 activation, then
    # differentiate the class score of the head w.r.t. that activation.
    def head_from_act(a):
        pooled = jnp.mean(a, axis=(1, 2))
        if head_fn is not None:
            logits = head_fn(pooled)
        else:
            fc = variables["params"]["fc"]
            logits = pooled @ fc["kernel"] + fc["bias"]
        idx = jnp.broadcast_to(jnp.asarray(class_idx),
                               (a.shape[0],))
        picked = jnp.take_along_axis(logits, idx[:, None], axis=1)
        return jnp.sum(picked)

    *_, high = stages_model.apply(variables, images, train=False)
    grads = jax.grad(head_from_act)(high)          # (B, h, w, C)
    weights = jnp.mean(grads, axis=(1, 2), keepdims=True)
    cam = jnp.maximum(jnp.sum(weights * high, axis=-1), 0.0)  # ReLU
    cam_max = jnp.max(cam, axis=(1, 2), keepdims=True)
    return np.asarray(cam / jnp.maximum(cam_max, 1e-8))


def gradcam_r2plus1d(model, variables, clips, class_idx, head_fn=None):
    """CAM heatmaps for the R(2+1)D video backbone (models/r2plus1d.py) —
    the reference's commented visualisation target
    ``vid_model.backbone.layer4[-1]`` (src/main.py:95-108).

    clips: (B, T, H, W, C); class_idx: int or (B,).  ``head_fn(pooled)``
    maps pooled 512-d features → logits (defaults to the model's fc).

    Returns (B, T/8, H/16, W/16) heatmaps in [0, 1] — one spatial CAM per
    temporal super-frame; broadcast over the 8-frame window to overlay on
    the input clip.
    """
    stages_model = model.clone(output="stages")

    def head_from_act(a):
        pooled = jnp.mean(a, axis=(1, 2, 3))
        if head_fn is not None:
            logits = head_fn(pooled)
        else:
            fc = variables["params"]["fc"]
            logits = pooled @ fc["kernel"] + fc["bias"]
        idx = jnp.broadcast_to(jnp.asarray(class_idx), (a.shape[0],))
        picked = jnp.take_along_axis(logits, idx[:, None], axis=1)
        return jnp.sum(picked)

    high = stages_model.apply(variables, clips, train=False)  # (B,t,h,w,C)
    grads = jax.grad(head_from_act)(high)
    weights = jnp.mean(grads, axis=(1, 2, 3), keepdims=True)
    cam = jnp.maximum(jnp.sum(weights * high, axis=-1), 0.0)  # (B,t,h,w)
    cam_max = jnp.max(cam, axis=(1, 2, 3), keepdims=True)
    return np.asarray(cam / jnp.maximum(cam_max, 1e-8))


def show_cam_on_image(image: np.ndarray, cam: np.ndarray,
                      alpha: float = 0.5) -> np.ndarray:
    """Overlay a [0,1] heatmap on an HWC [0,1] image (the reference's
    ``show_cam_on_image`` helper).  Returns uint8 HWC."""
    from PIL import Image

    h, w = image.shape[:2]
    heat = np.asarray(Image.fromarray(
        (cam * 255).astype(np.uint8)).resize((w, h), Image.BILINEAR),
        np.float32) / 255.0
    # simple jet-style colormap: blue → green → red
    r = np.clip(1.5 * heat - 0.5, 0, 1)
    g = 1.0 - np.abs(2.0 * heat - 1.0)
    b = np.clip(1.0 - 1.5 * heat, 0, 1)
    colored = np.stack([r, g, b], axis=-1)
    out = (1 - alpha) * image + alpha * colored
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)
