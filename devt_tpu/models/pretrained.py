"""Frozen expert feature extractors for offline embedding extraction.

Capability twin of ``EmbeddingExtractor``
(src/models/pretrained/models.py:8-122): per-modality frozen backbones with
the classifier removed (``fc = Identity``, models.py:10-20):

  * ``image``    — resnet50 (ImageNet in the reference) → 2048-d
  * ``video``    — r3d_18 (Kinetics) → 512-d
  * ``location`` — resnet50 (Places-style weights) → 2048-d

The reference's commented audio-VGGish and MiDaS-depth experts
(models.py:13,16,18) stay out of scope, matching its shipped behavior.

Weights default to random init (the reference downloads from model zoos —
this environment has no egress); ``load_torch_state_dict`` ports real
torchvision weights when available.  ``return_expert_for_key`` pools
frame-level embeddings into a single vector with adaptive average pooling
(models.py:69-122 semantics).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

from devt_tpu.models.contrastive import adaptive_avg_pool_1d
from devt_tpu.models.r2plus1d import r3d_18
from devt_tpu.models.resnet import resnet50

EXPERT_DIMS = {"image": 2048, "video": 512, "location": 2048}


class EmbeddingExtractor:
    """Stateful host-side wrapper bundling the frozen expert models."""

    def __init__(self, seed: int = 0):
        self.models = {
            "image": resnet50(output="features"),
            "video": r3d_18(output="features"),
            "location": resnet50(output="features"),
        }
        self.variables = {}
        key = jax.random.PRNGKey(seed)
        dummies = {
            "image": jnp.zeros((1, 224, 224, 3)),
            "video": jnp.zeros((1, 16, 112, 112, 3)),
            "location": jnp.zeros((1, 224, 224, 3)),
        }
        for name, model in self.models.items():
            key, sub = jax.random.split(key)
            self.variables[name] = model.init(sub, dummies[name], train=False)
        self._apply = {
            name: jax.jit(lambda v, x, m=model: m.apply(v, x, train=False))
            for name, model in self.models.items()
        }

    def load_torch_state_dict(self, name: str, variables) -> None:
        """Install ported weights (see devt_tpu/utils/torch_port.py)."""
        self.variables[name] = variables

    # per-modality forwards (models.py:27-57) ---------------------------
    def forward_img(self, frames):
        """(N, 224, 224, 3) frames → (N, 2048)."""
        return self._apply["image"](self.variables["image"], frames)

    def forward_location(self, frames):
        return self._apply["location"](self.variables["location"], frames)

    def forward_video(self, clip):
        """(N, T, 112, 112, 3) clips → (N, 512)."""
        return self._apply["video"](self.variables["video"], clip)

    # pooling (models.py:69-122) ----------------------------------------
    def return_expert_for_key(self, key: str, data):
        """Run the expert and pool the per-frame/clip embeddings into one
        vector via adaptive average pooling over the batch axis."""
        if key in ("img-embeddings", "image", "location-embeddings",
                   "location"):
            fwd = self.forward_location if "location" in key else \
                self.forward_img
            emb = fwd(data)                     # (N, D)
        elif key in ("video-embeddings", "video"):
            emb = self.forward_video(data)      # (N, D)
        else:
            raise KeyError(f"unknown expert key {key!r}")
        # pool N frame-level vectors to one (models.py:99-122):
        return adaptive_avg_pool_1d(emb.T, 1)[:, 0]
