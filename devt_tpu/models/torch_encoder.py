"""Transformer encoder with torch ``nn.TransformerEncoder`` semantics.

The reference builds its scene/expert/clip encoders from torch's
``TransformerEncoderLayer`` (src/models/transformer.py:39-47,
src/models/frame_transformer.py:41-44): post-norm residual blocks with
ReLU feed-forward and attention-probability dropout.  That exact compute
graph is reproduced here (batch-major) so ported torch weights give
bit-comparable logits; the softmax itself runs through the dispatching
attention kernel (Pallas flash on TPU).

torch layer forward (torch 1.x defaults: norm_first=False, relu):
    x = norm1(x + dropout(self_attn(x)))       # attn-prob dropout inside
    x = norm2(x + dropout(linear2(dropout(relu(linear1(x))))))
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from devt_tpu.models.layers import LN_EPS
from devt_tpu.ops.attention import packed_mha


def _quant_dot_general(deterministic: bool):
    """int8 ``dot_general`` for the four big Dense sites when tracing
    under ``serve.Predictor(quantize=True)``'s quant_scope (eval only),
    else None → flax's default f32/bf16 contraction.  Same param tree
    either way — the kernel is quantized at the call site, so quantized
    serving is checkpoint-compatible with every trained model."""
    from devt_tpu.ops.attention import quant_active

    if deterministic and quant_active():
        from devt_tpu.ops.quant import int8_dot_general
        return int8_dot_general
    return None


class TorchMultiheadAttention(nn.Module):
    """Self-attention matching ``torch.nn.MultiheadAttention``.

    Packed qkv projection with bias (torch's ``in_proj_weight`` of shape
    (3E, E) maps to our (E, 3E) kernel), scaled by 1/sqrt(head_dim),
    dropout applied to the softmax probabilities, biased output projection.
    """
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    attention_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, s, e = x.shape
        assert e == self.embed_dim
        head_dim = e // self.num_heads

        dg = _quant_dot_general(deterministic)
        qkv = nn.Dense(3 * e, dtype=self.dtype, name="in_proj",
                       dot_general=dg)(x)

        dropout_rng = None
        use_drop = self.dropout > 0.0 and not deterministic
        if use_drop:
            dropout_rng = self.make_rng("dropout")
        # the dispatch handles dropout: "auto" runs the fused kernel's
        # in-kernel attention-prob dropout on a single-device TPU and the
        # xla formulation elsewhere (ops/attention.packed_mha) — no
        # override here, or the reference's dropout-training configs
        # silently lose the fused path
        out = packed_mha(
            qkv, heads=self.num_heads, scale=head_dim ** -0.5,
            impl=self.attention_impl,
            dropout_rate=self.dropout if use_drop else 0.0,
            dropout_rng=dropout_rng)
        return nn.Dense(e, dtype=self.dtype, name="out_proj",
                        dot_general=dg)(out)


class TorchEncoderLayer(nn.Module):
    """Post-norm encoder layer = torch ``TransformerEncoderLayer``."""
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    attention_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        attn = TorchMultiheadAttention(
            self.d_model, self.nhead, dropout=self.dropout,
            attention_impl=self.attention_impl, dtype=self.dtype,
            name="self_attn")(x, deterministic=deterministic)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(x + attn)

        dg = _quant_dot_general(deterministic)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1",
                     dot_general=dg)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2",
                     dot_general=dg)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(x + h)


class TorchTransformerEncoder(nn.Module):
    """Stack of ``TorchEncoderLayer`` (= torch ``TransformerEncoder``).

    torch's ``TransformerEncoder(layer, n)`` deep-copies the layer n times
    (independent weights per layer) and applies no final norm by default —
    both reproduced here.  Input/output are batch-major (B, S, D).
    """
    d_model: int
    nhead: int
    dim_feedforward: int
    num_layers: int
    dropout: float = 0.1
    attention_impl: str = "auto"
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        layer_cls = TorchEncoderLayer
        if self.remat:
            # rematerialise each layer on the backward pass — trades FLOPs
            # for HBM (SURVEY/BASELINE "jax.checkpoint" intent)
            layer_cls = nn.remat(TorchEncoderLayer,
                                 static_argnums=(2,))
        for i in range(self.num_layers):
            x = layer_cls(
                self.d_model, self.nhead, self.dim_feedforward,
                dropout=self.dropout, attention_impl=self.attention_impl,
                dtype=self.dtype, name=f"layer_{i}")(
                    x, deterministic)
        return x
