"""Temporal pyramid network (TPN).

Capability twin of src/models/TPN.py:1-112: a multi-scale *spatial*
pyramid over intermediate ResNet-34 features per frame, followed by a
multi-scale *temporal* relation module over the frame sequence.

  * Backbone: resnet34 returning the layer2/3/4 stage features
    (src/models/custom_resnet.py:138-153).
  * Spatial pyramid: global average pooling of each stage (the reference
    pools with kernel == feature size: 28/14/7 for 224² inputs,
    TPN.py:2-40) + 1×1 convs on the low/mid branches.  NOTE the reference's
    high branch *defines* a 1×1 conv but never applies it (TPN.py:22-26) —
    that quirk is preserved (no conv on the high branch).
  * Frame feature: concat(high 512, mid 256, low 128) = 896 (TPN.py:53-59).
  * ``Reasoning``: for each scale g ∈ [start, max_group], sum groups of g
    adjacent frames (``sum_group``, TPN.py:64-72 — trailing frames that
    don't fill a group are dropped), flatten, per-scale MLP with Sigmoid
    output, predictions averaged over scales (TPN.py:75-112).

Vectorised: ``sum_group``'s Python loop becomes a reshape+sum, and the
per-frame CNN runs with frames folded into the batch.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from devt_tpu.models.resnet import resnet34


def sum_group(x, groups: int):
    """(B, T, D) → (B, (T//groups)*D): sum each ``groups`` adjacent frames
    and concatenate the group sums (src/models/TPN.py:64-72)."""
    b, t, d = x.shape
    n = t // groups
    x = x[:, : n * groups].reshape(b, n, groups, d)
    return jnp.sum(x, axis=2).reshape(b, n * d)


class Reasoning(nn.Module):
    """Multi-scale temporal relation module (src/models/TPN.py:75-112)."""
    num_segments: int = 4
    num_frames: int = 5
    num_class: int = 15
    img_dim: int = 896
    max_group: int = 4
    start: int = 2
    bottleneck: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, num_segments*num_frames, img_dim) → (B, num_class)."""
        total = self.num_segments * self.num_frames
        prediction = 0.0
        for g in range(self.start, self.max_group + 1):
            seg = sum_group(x, g)
            # fc_fusion: ReLU→Linear→ReLU→Dropout(.6)→Linear→ReLU→
            # Dropout(.5)→Linear→Sigmoid (TPN.py:88-101)
            h = nn.relu(seg)
            h = nn.Dense(self.bottleneck, dtype=self.dtype,
                         name=f"scale{g}_fc1")(h)
            h = nn.relu(h)
            h = nn.Dropout(0.6)(h, deterministic=not train)
            h = nn.Dense(self.bottleneck, dtype=self.dtype,
                         name=f"scale{g}_fc2")(h)
            h = nn.relu(h)
            h = nn.Dropout(0.5)(h, deterministic=not train)
            h = nn.Dense(self.num_class, dtype=self.dtype,
                         name=f"scale{g}_fc3")(h)
            prediction = prediction + nn.sigmoid(h)
        return prediction / (self.max_group - self.start + 1)


class TPN(nn.Module):
    """Frame CNN pyramid + temporal reasoning (src/models/TPN.py:43-61).

    Input: (B, T, H, W, C) frames with T = num_segments*num_frames (20 in
    the reference, TPN.py:59).  Output: (B, num_class) sigmoid-averaged
    predictions.
    """
    num_segments: int = 4
    num_frames: int = 5
    num_class: int = 15
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t = x.shape[:2]
        frames = x.reshape((b * t,) + x.shape[2:]).astype(self.dtype)
        low, mid, high = resnet34(output="stages", dtype=self.dtype,
                                  name="backbone")(frames, train=train)

        # Spatial pyramid: pool each stage to 1×1 (kernel == map size in the
        # reference), 1×1 convs on low/mid only (TPN.py:2-40 quirk).
        low_v = jnp.mean(low, axis=(1, 2), keepdims=True)
        low_v = nn.Conv(128, (1, 1), dtype=self.dtype,
                        name="low_reduce")(low_v)[:, 0, 0]
        mid_v = jnp.mean(mid, axis=(1, 2), keepdims=True)
        mid_v = nn.Conv(256, (1, 1), dtype=self.dtype,
                        name="mid_reduce")(mid_v)[:, 0, 0]
        high_v = jnp.mean(high, axis=(1, 2))

        feat = jnp.concatenate([high_v, mid_v, low_v], axis=-1)  # (B*T, 896)
        feat = feat.reshape(b, t, -1)
        return Reasoning(self.num_segments, self.num_frames, self.num_class,
                         dtype=self.dtype, name="reason")(feat, train=train)
