"""ViViT — factorized space-time vision transformer.

Capability twin of the reference's self-contained model
(reference: src/models/vit.py:79-128):

  * linear patch embedding over per-frame patches (vit.py:89-92),
  * learned positional embedding of shape (1, frames, patches+1, dim)
    (vit.py:94) added after a per-frame space CLS token is prepended,
  * a *space* transformer over each frame's patch sequence (vit.py:118-119),
  * a *temporal* transformer over the per-frame CLS outputs with a
    temporal CLS token (vit.py:122-125),
  * 'cls' or 'mean' pooling into a LayerNorm+Linear head (vit.py:104-107,126).

TPU-first notes: the patch embed is a reshape + one big matmul (MXU);
the space transformer runs with the frame axis folded into the batch
(static shapes, no Python loops); attention dispatches to the Pallas
flash kernel on TPU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from devt_tpu.models.layers import LN_EPS, ViTTransformer


def _pad_tokens(x, mult: int):
    """Zero-pad the token axis of (B, N, D) to a multiple of ``mult``.

    197 patch tokens are a miserable TPU shape — every layer op pays
    padding/relayout tax.  Padding once up front (with the pad masked out
    of attention via ``kv_len``) keeps all layer matmuls tile-aligned.
    Pad rows compute garbage that never contaminates real rows: attention
    masks them as keys, and LN/FFN/residuals are row-local.
    """
    n = x.shape[1]
    target = ((n + mult - 1) // mult) * mult
    if target == n:
        return x, n
    return jnp.pad(x, ((0, 0), (0, target - n), (0, 0))), n


class PatchEmbed(nn.Module):
    """Linear patch embedding executed as one dot_general.

    The parameter keeps the Dense layout ``kernel (p*p*c, dim)`` (feature
    order p1, p2, c — matching the reference's Rearrange+Linear,
    vit.py:89-92) so ports/checkpoints are unchanged, but the compute path
    is ``conv_general_dilated`` with stride = patch.  Measured
    alternatives on v5e (512,224,224,3): a free-reshape + dot_general
    formulation wins STANDALONE (1.87 vs 2.24 ms fwd+dW) but regresses
    the full ViViT train step by ~3 ms — inside the big program XLA
    schedules the conv better than the transpose the dot requires; the
    explicit 7-D transpose tiles a last-dim-3 array at ~2% lane
    efficiency.  A transpose-FREE im2col dot ((BT,14,16,14,48) ·
    (16,48,D), both reshapes contiguous) is also worse: full step 23.1
    vs 19.4 ms — the (16, 48)-shaped contraction tiles the MXU poorly.
    The conv stays.
    """
    patch_size: int
    in_channels: int
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, tokens: bool = False):
        """(BT, H, W, C) → (BT, H/p, W/p, dim); or with ``tokens=True``
        pre-patchified input (..., N, p*p*c) → (..., N, dim).

        The tokens path is one clean (K = p*p*c) dot — none of the
        lane-split relayouts that doomed the on-device im2col variants
        (see the conv note below), because the (p1, p2, c) permutation
        already happened upstream (ideally at decode time in the native
        loader, where it is free)."""
        p, c = self.patch_size, self.in_channels
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (p * p * c, self.dim))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        if tokens:
            return (jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                            preferred_element_type=self.dtype)
                    + bias.astype(self.dtype))
        k = kernel.reshape(p, p, c, self.dim).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k, window_strides=(p, p), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)
        return y + bias.astype(self.dtype)


def patchify(x, patch_size: int):
    """(B, T, H, W, C) channels-last pixels → (B, T, N, p*p*c) tokens.

    Patch feature order is (p1, p2, c) — the reference's
    ``Rearrange('b t c (h p1) (w p2) -> b t (h w) (p1 p2 c)')``
    (vit.py:89-91) and the layout ``PatchEmbed.kernel`` expects.  This is
    the device-side reference implementation; the native loader emits the
    same layout for free at decode time (the permutation is just an index
    map over bytes it is already writing)."""
    b, t, h, w, c = x.shape
    p = patch_size
    x = x.reshape(b, t, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(b, t, (h // p) * (w // p), p * p * c)


class ViViT(nn.Module):
    image_size: int = 224
    patch_size: int = 16
    num_classes: int = 100
    num_frames: int = 16
    dim: int = 192
    depth: int = 4
    heads: int = 3
    pool: str = "cls"
    in_channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    scale_dim: int = 4
    attention_impl: str = "auto"
    # The temporal transformer sees tiny shapes (B seqs of ~frames+1
    # tokens); measured on v5e the Pallas and XLA paths are equal in the
    # full train step (24.15 vs 24.14 ms — the launches overlap fine), so
    # the default is the XLA path: same speed, fewer kernel compilations,
    # and no Pallas shape constraints on degenerate token counts.  Set to
    # None to inherit ``attention_impl``.  Parameter trees are identical
    # either way, so checkpoints are interchangeable.
    temporal_attention_impl: str | None = "xla"
    token_pad: int = 16          # pad token axes to this multiple (0 = off)
    channels_last: bool = False  # True: input (B,T,H,W,C) — TPU-native
    remat: bool = False          # rematerialise blocks on backward
    # moe_experts > 0: every moe_every-th SPACE-transformer layer's FFN
    # becomes a switch MoE (models/layers.py MoEViTBlock — beyond parity;
    # the temporal transformer stays dense: its token count is tiny)
    moe_experts: int = 0
    moe_every: int = 2
    moe_capacity_factor: float = 1.25
    # pipeline_stages > 1: the SPACE transformer's depth splits into
    # GPipe stages over a "pipe" mesh axis (config.pp;
    # parallel/pipeline.py).  The temporal transformer stays sequential —
    # its per-frame CLS sequence is tiny.  Requires dropout == 0 and
    # depth % stages == 0; stacks the space-block params (see
    # layers.ViTTransformer.pipeline_stages).
    pipeline_stages: int = 0
    pipeline_microbatches: int = 0
    # sequence_parallel (config.sp > 1): the SPACE transformer's token
    # axis shards over a "seq" mesh axis and attention runs the kv ring
    # (parallel/ring_attention.py); declares the same stacked pb_*
    # layout as pp (checkpoints interchangeable).  The temporal
    # transformer stays dense — its per-frame CLS sequence is tiny.
    sequence_parallel: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.pool in ("cls", "mean"), \
            "pool type must be either cls (cls token) or mean (mean pooling)"
        assert self.image_size % self.patch_size == 0, \
            "Image dimensions must be divisible by the patch size."
        num_patches = (self.image_size // self.patch_size) ** 2

        self.patch_embed = PatchEmbed(self.patch_size, self.in_channels,
                                      self.dim, dtype=self.dtype,
                                      name="patch_embed")
        # (1, num_frames, num_patches + 1, dim) — vit.py:94
        self.pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(stddev=1.0),
            (1, self.num_frames, num_patches + 1, self.dim))
        self.space_token = self.param(
            "space_token", nn.initializers.normal(stddev=1.0),
            (1, 1, self.dim))
        self.temporal_token = self.param(
            "temporal_token", nn.initializers.normal(stddev=1.0),
            (1, 1, self.dim))
        self.space_transformer = ViTTransformer(
            self.dim, self.depth, self.heads, self.dim_head,
            self.dim * self.scale_dim, dropout=self.dropout,
            attention_impl=self.attention_impl, remat=self.remat,
            moe_experts=self.moe_experts, moe_every=self.moe_every,
            moe_capacity_factor=self.moe_capacity_factor,
            pipeline_stages=self.pipeline_stages,
            pipeline_microbatches=self.pipeline_microbatches,
            sequence_parallel=self.sequence_parallel,
            dtype=self.dtype, name="space_transformer")
        t_impl = (self.attention_impl if self.temporal_attention_impl is None
                  else self.temporal_attention_impl)
        self.temporal_transformer = ViTTransformer(
            self.dim, self.depth, self.heads, self.dim_head,
            self.dim * self.scale_dim, dropout=self.dropout,
            attention_impl=t_impl, remat=self.remat,
            dtype=self.dtype, name="temporal_transformer")
        self.emb_drop = nn.Dropout(self.emb_dropout)
        self.head_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                      name="head_norm")
        self.head = nn.Dense(self.num_classes, dtype=self.dtype, name="head")

    def __call__(self, x, deterministic: bool = True,
                 tokens_in: bool = False):
        """x: (B, T, C, H, W) — or (B, T, H, W, C) with ``channels_last``
        — video clip → (B, num_classes) logits.

        ``tokens_in=True``: x is pre-patchified (B, T, N, p*p*c) tokens
        (``patchify`` layout; the native loader emits it at decode time).
        Skips the conv patch embed for one clean K=p*p*c matmul — the
        host-side patchify removes ~2 ms of conv relayout from the
        224² train step."""
        if tokens_in:
            b, t = x.shape[:2]
            x = self.patch_embed(x, tokens=True)
        else:
            if not self.channels_last:
                x = x.transpose(0, 1, 3, 4, 2)        # → (B, T, H, W, C)
            b, t = x.shape[:2]
            x = self.patch_embed(x.reshape((b * t,) + x.shape[2:]))
            x = x.reshape(b, t, -1, self.dim)
        n, d = x.shape[2], x.shape[3]

        cls_space = jnp.broadcast_to(self.space_token.astype(self.dtype),
                                     (b, t, 1, d))
        x = jnp.concatenate([cls_space, x], axis=2)     # (b, t, n+1, d)
        x = x + self.pos_embedding[:, :, : n + 1].astype(self.dtype)
        x = self.emb_drop(x, deterministic=deterministic)

        # Space attention with frames folded into batch (vit.py:118-119),
        # token axis tile-padded (pad masked out of attention).
        x = x.reshape(b * t, n + 1, d)
        kv_len = None
        if self.token_pad:
            x, kv_len = _pad_tokens(x, self.token_pad)
        x = self.space_transformer(x, deterministic=deterministic,
                                   kv_len=kv_len)
        x = x[:, 0].reshape(b, t, d)                    # per-frame CLS

        cls_temporal = jnp.broadcast_to(self.temporal_token.astype(self.dtype),
                                        (b, 1, d))
        x = jnp.concatenate([cls_temporal, x], axis=1)  # (b, t+1, d)
        kv_len = None
        if self.token_pad:
            x, kv_len = _pad_tokens(x, self.token_pad)
        x = self.temporal_transformer(x, deterministic=deterministic,
                                      kv_len=kv_len)
        x = x[:, : t + 1]       # drop pad rows before pooling

        x = jnp.mean(x, axis=1) if self.pool == "mean" else x[:, 0]
        return self.head(self.head_norm(x))
