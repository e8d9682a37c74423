"""Int8 weight+activation quantization for the serving path.

The reference has no quantized-inference story (its deployment is
``trainer.test`` inside the training venv, src/main.py:89-111).  This is
the TPU-native one: the v5e MXU executes int8×int8→int32 contractions at
~2× the bf16 FLOP rate (394 vs 197 TOPS peak), so serving the
transformer hot path in int8 raises the inference ceiling on the exact
hardware this framework targets.

Scheme — the standard production weight+dynamic-activation recipe:

  * weights: symmetric per-output-channel int8.  Each column of a
    ``(K, N)`` matrix gets its own f32 scale ``max|w|/127``, so one
    badly-scaled channel cannot wreck the rest.  Quantized ONCE —
    :class:`devt_tpu.serve.Predictor` bakes params in as compile-time
    constants under ``quantize=True`` and XLA constant-folds the
    weight-side rounding entirely out of the serving program.
  * activations: symmetric per-token (per row) int8, scales computed
    dynamically from the live batch (``max|x|/127`` over the feature
    axis).  No calibration corpus needed; matches the serving reality
    that activation ranges are input-dependent.
  * the contraction runs int8×int8 with ``preferred_element_type=int32``
    (the MXU-native accumulate), then dequantizes as
    ``acc · x_scale · w_scale`` — a rank-1 outer product of the two
    scale vectors, fused by XLA into the surrounding elementwise work.

What is quantized: the four big ViT-block matrices (Wqkv, Wo, W1, W2 —
where the serving FLOPs are).  LayerNorm statistics, softmax, residuals
and the attention core itself stay bf16/f32: attention operates on
d_head=64 contractions whose accuracy is range-sensitive and whose FLOP
share is small, and the fused flash kernel already serves it at
speed-of-light (ops/flash_attention.py).

Block semantics mirror ``ops/fused_block.fused_vit_block`` in eval mode
(pre-norm, tanh-approx GELU, kv-length masking) — the reference block
(src/models/vit.py:17-58) with dropout off, so a ``quantize=True``
Predictor is checkpoint-compatible with every trained ViViT/frame model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from devt_tpu.ops.fused_block import (_VMEM_LIMIT, _gelu, _group, _ln,
                                       _mha_fwd, _param_spec, _row_spec)

_EPS = 1e-8


def quantize_weight(w, *, axis: int = 0):
    """Symmetric per-output-channel int8: returns ``(w_q, scale)``.

    ``axis`` is the CONTRACTION axis (reduced over in the matmul); the
    scale is taken per remaining (output) channel and keeps ``w``'s
    dims, so ``w_q.astype(f32) * scale ≈ w`` broadcasts directly.
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis,
                   keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale),
                   -127, 127).astype(jnp.int8)
    return w_q, scale


def quantize_activation(x):
    """Dynamic symmetric per-row int8 over the last axis: ``(x_q, scale)``
    with ``scale`` shaped ``x.shape[:-1] + (1,)``."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                   -127, 127).astype(jnp.int8)
    return x_q, scale


def int8_matmul(x, w_q, w_scale):
    """``x @ dequant(w_q)`` with the contraction in int8 on the MXU.

    x: (..., K) float; w_q: (K, N) int8; w_scale: (1, N) f32.
    Returns f32 (..., N).
    """
    x_q, x_scale = quantize_activation(x)
    acc = jax.lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * x_scale * w_scale


def int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    """Drop-in ``dot_general`` for ``flax.linen.Dense(dot_general=...)``:
    the contraction runs int8×int8→int32 on the MXU, weights quantized
    per output channel, activations per row.

    Only the Dense shape is supported — ``(..., K) · (K, N)`` with no
    batch dims — which is the one flax emits.  ``precision`` /
    ``preferred_element_type`` are accepted for signature compatibility
    and ignored (the int32 accumulate is fixed).  The result is cast
    back to ``lhs.dtype`` so the surrounding module's dtype flow is
    unchanged.  When the kernel enters as a jit constant (the serving
    Predictor closes parameters over the trace), XLA folds the
    weight-side quantization into the compiled program.
    """
    del precision, preferred_element_type
    ((lc, rc), (lb, rb)) = dimension_numbers
    assert (tuple(lc), tuple(rc)) == ((lhs.ndim - 1,), (0,)) \
        and not lb and not rb, dimension_numbers
    x_q, x_scale = quantize_activation(lhs)
    w_q, w_scale = quantize_weight(rhs, axis=0)
    acc = jax.lax.dot_general(
        x_q, w_q, dimension_numbers, preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * x_scale * w_scale).astype(lhs.dtype)


def quant_block_params(params):
    """Pre-quantize a fused-block param dict (ops/fused_block layout:
    g1/b1/wqkv/wo/bo/g2/b2/w1/bb1/w2/bb2) → the tree
    :func:`quant_vit_block` consumes.  Idempotent inputs only (full-
    precision weights in, int8+scales out)."""
    out = {k: params[k] for k in
           ("g1", "b1", "bo", "g2", "b2", "bb1", "bb2")}
    for k in ("wqkv", "wo", "w1", "w2"):
        out[k + "_q"], out[k + "_s"] = quantize_weight(params[k])
    return out


def quant_vit_block(x, qp, heads: int, scale: float, kv_len: int,
                    *, impl: str = "auto", interpret: bool = False):
    """Pre-norm ViT block forward, big matmuls in int8 (eval only).

    Numerics: residual stream and LN in f32, attention core in the
    model dtype through the standard dispatching attention (flash
    kernel on TPU), GELU via the fused path's tanh approximation —
    identical structure to ``fused_vit_block`` so logits stay within
    quantization error of the full-precision path.  For configs that
    serve full precision through the UNFUSED flax path (exact erf GELU,
    layers.py), the tanh form adds a small systematic ~3e-4 deviation on
    top of int8 error — attribute accuracy deltas accordingly.

    ``impl`` threads the block's ``attention_impl`` through to
    :func:`scaled_dot_product_attention` so an explicitly pinned
    ``'xla'`` config (the cross-platform export prerequisite,
    serve.py) never traces a pallas_call here.
    """
    from devt_tpu.ops.attention import scaled_dot_product_attention

    b, s, dim = x.shape
    inner = qp["wqkv_q"].shape[1] // 3
    d = inner // heads
    x32 = x.astype(jnp.float32)
    a, _, _, _ = _ln(x32, qp["g1"].astype(jnp.float32),
                     qp["b1"].astype(jnp.float32))
    qkv = int8_matmul(a, qp["wqkv_q"], qp["wqkv_s"])
    # packed (3, H, d) column order — the _AttnParams/fused layout
    qkv = qkv.reshape(b, s, 3, heads, d).transpose(2, 0, 3, 1, 4)
    att = scaled_dot_product_attention(
        qkv[0].astype(x.dtype), qkv[1].astype(x.dtype),
        qkv[2].astype(x.dtype), scale=scale, kv_len=kv_len,
        impl=impl, interpret=interpret)
    att = att.transpose(0, 2, 1, 3).reshape(b, s, inner)
    u = x32 + int8_matmul(att, qp["wo_q"], qp["wo_s"]) \
        + qp["bo"].astype(jnp.float32)
    h2, _, _, _ = _ln(u, qp["g2"].astype(jnp.float32),
                      qp["b2"].astype(jnp.float32))
    z1 = int8_matmul(h2, qp["w1_q"], qp["w1_s"]) \
        + qp["bb1"].astype(jnp.float32)
    h = _gelu(z1)
    z2 = int8_matmul(h, qp["w2_q"], qp["w2_s"]) \
        + qp["bb2"].astype(jnp.float32)
    return (u + z2).astype(x.dtype)
