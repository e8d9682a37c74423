"""SimCLR-style multi-modal contrastive model.

Capability twin of ``SpatioTemporalContrastiveModel``
(src/models/contrastivemodel.py:12-214):

  * MLP encoder Linear(no-bias)→ReLU→BatchNorm→Linear(no-bias)→ReLU→Linear
    (contrastivemodel.py:27-34),
  * projector ReLU→Linear→ReLU→Dropout(0.1)→Linear
    (contrastivemodel.py:36-42),
  * ``__call__`` returns (embedding, projection) (contrastivemodel.py:49-55),
  * expert aggregation modes none / avg_pool / mean_pool / concat /
    collab_gate (contrastivemodel.py:116-137; ``mean_pool`` uses an
    undefined ``size`` in the reference — evident intent, adaptive max-pool
    to the input width, implemented),
  * trains with the SimCLR loss on L2-normalised projections
    (contrastivemodel.py:160-166 + losses/ntxent.py); the cross-replica
    NT-Xent variant lives in devt_tpu/models/losses.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from devt_tpu.models.resnet import BN_EPS, BN_MOMENTUM


def adaptive_avg_pool_1d(x, out_size: int):
    """torch ``F.adaptive_avg_pool1d`` semantics on the last axis."""
    n = x.shape[-1]
    starts = (jnp.arange(out_size) * n) // out_size
    ends = ((jnp.arange(out_size) + 1) * n + out_size - 1) // out_size
    # Static per-bin segments (out_size is static) — unrolled gather+mean.
    cums = jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (1,), x.dtype),
         jnp.cumsum(x, axis=-1)], axis=-1)
    seg = jnp.take(cums, ends, axis=-1) - jnp.take(cums, starts, axis=-1)
    return seg / (ends - starts).astype(x.dtype)


def adaptive_max_pool_1d(x, out_size: int):
    """torch ``F.adaptive_max_pool1d`` semantics on the last axis."""
    n = x.shape[-1]
    outs = []
    for i in range(out_size):
        s = (i * n) // out_size
        e = ((i + 1) * n + out_size - 1) // out_size
        outs.append(jnp.max(x[..., s:e], axis=-1))
    return jnp.stack(outs, axis=-1)


def expert_aggregation(experts, mode: str, input_size: int):
    """Aggregate a tuple/list of per-modality tensors (..., d_i).

    Reference: src/models/contrastivemodel.py:116-137.
    """
    if mode == "none":
        return experts[0]
    if mode == "concat":
        return jnp.concatenate(experts, axis=-1)
    if mode == "avg_pool":
        return adaptive_avg_pool_1d(jnp.concatenate(experts, axis=-1),
                                    input_size)
    if mode == "mean_pool":
        return adaptive_max_pool_1d(jnp.concatenate(experts, axis=-1),
                                    input_size)
    if mode == "collab_gate":
        # handled upstream by CollaborativeGating (contrastivemodel.py:134-135
        # is a pass-through)
        return experts
    raise ValueError(f"unknown aggregation {mode!r}")


class ContrastiveEncoder(nn.Module):
    """Encoder + projector; returns (embedding, projection)."""
    input_shape: int = 2048
    hidden_layer: int = 2048
    projection_size: int = 305
    output_shape: int = 128
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    # When set (the shard_map DP step sets it to the data axis), batch
    # stats are psum'd across replicas — SyncBN over ICI.  Required for
    # global-batch semantics: NT-Xent gathers a global negatives pool, so
    # per-replica BN stats (degenerate at small per-device batches) would
    # break loss parity with the single-device global-batch step.
    bn_sync_axis: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        # encoder_net — contrastivemodel.py:27-34
        h = nn.Dense(self.hidden_layer, use_bias=False, dtype=self.dtype,
                     name="enc_fc1")(x)
        h = nn.relu(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="enc_bn",
                         axis_name=self.bn_sync_axis)(h)
        h = nn.Dense(self.hidden_layer, use_bias=False, dtype=self.dtype,
                     name="enc_fc2")(h)
        h = nn.relu(h)
        embedding = nn.Dense(self.projection_size, dtype=self.dtype,
                             name="enc_fc3")(h)
        # projector_net — contrastivemodel.py:36-42
        p = nn.relu(embedding)
        p = nn.Dense(self.projection_size, dtype=self.dtype,
                     name="proj_fc1")(p)
        p = nn.relu(p)
        p = nn.Dropout(self.dropout)(p, deterministic=not train)
        projection = nn.Dense(self.output_shape, dtype=self.dtype,
                              name="proj_fc2")(p)
        return embedding, projection


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch ``F.normalize(p=2)`` semantics."""
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)
