"""MLP baseline for aggregated expert embeddings (MIT 305-way).

Capability twin of ``BasicMLP`` (src/models/basicmlp.py:10-57):
fc1(in→in) → ReLU → fc2(in→bottleneck) → ReLU → BatchNorm →
fc3(bottleneck→bottleneck) → ReLU (the "embedding" tap) → fc4(→305),
trained with cross-entropy (basicmlp.py:28,31-36).

NOTE the reference's BatchNorm is hard-wired to 1024 features
(basicmlp.py:23), which only works when ``bottle_neck == 1024``; here it
follows the bottleneck width.  Expert aggregation reuses
devt_tpu.models.contrastive.expert_aggregation (the reference duplicates
it, basicmlp.py:43-57).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from devt_tpu.models.resnet import BN_EPS, BN_MOMENTUM


class BasicMLP(nn.Module):
    input_shape: int = 2048
    bottle_neck: int = 1024
    n_classes: int = 305
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_embedding: bool = False):
        x = x.astype(self.dtype)
        h = nn.relu(nn.Dense(self.input_shape, dtype=self.dtype,
                             name="fc1")(x))
        h = nn.relu(nn.Dense(self.bottle_neck, dtype=self.dtype,
                             name="fc2")(h))
        h = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn")(h)
        embedding = nn.relu(nn.Dense(self.bottle_neck, dtype=self.dtype,
                                     name="fc3")(h))
        logits = nn.Dense(self.n_classes, dtype=self.dtype,
                          name="fc4")(embedding)
        if return_embedding:
            return logits, embedding
        return logits
