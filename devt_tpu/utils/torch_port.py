"""Torch → JAX weight-porting utilities.

The parity requirement (BASELINE.json: logits ≤1e-3 relative error vs the
PyTorch reference) is checked by porting torch weights into the flax
modules and comparing outputs.  These converters know torch's layout
conventions so nothing else in the package has to:

  * ``torch.nn.Linear.weight`` is (out, in) — flax ``Dense.kernel`` is (in, out).
  * ``torch.nn.MultiheadAttention`` packs q/k/v into ``in_proj_weight`` (3E, E).
  * ``torch.nn.Conv2d.weight`` is (O, I, kH, kW) — flax ``Conv.kernel`` is
    (kH, kW, I, O); Conv3d (O, I, kT, kH, kW) → (kT, kH, kW, I, O).
  * BatchNorm running stats live in flax's ``batch_stats`` collection.

All functions take plain numpy-convertible mappings (a torch
``state_dict()`` works directly), so torch itself is only needed by the
caller, never by this module.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def linear(sd: Mapping[str, Any], prefix: str) -> dict:
    """torch Linear → flax Dense params."""
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def layernorm(sd: Mapping[str, Any], prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def conv2d(sd: Mapping[str, Any], prefix: str) -> dict:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv3d(sd: Mapping[str, Any], prefix: str) -> dict:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 4, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def batchnorm(sd: Mapping[str, Any], prefix: str) -> tuple[dict, dict]:
    """Returns (params, batch_stats) halves of a torch BatchNorm."""
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def multihead_attention(sd: Mapping[str, Any], prefix: str) -> dict:
    """torch MultiheadAttention → TorchMultiheadAttention params."""
    return {
        "in_proj": {"kernel": _np(sd[f"{prefix}.in_proj_weight"]).T,
                    "bias": _np(sd[f"{prefix}.in_proj_bias"])},
        "out_proj": linear(sd, f"{prefix}.out_proj"),
    }


def transformer_encoder(sd: Mapping[str, Any], num_layers: int,
                        prefix: str = "layers") -> dict:
    """torch ``TransformerEncoder`` state_dict → ``TorchTransformerEncoder``
    params (devt_tpu/models/torch_encoder.py)."""
    params: dict = {}
    for i in range(num_layers):
        p = f"{prefix}.{i}"
        params[f"layer_{i}"] = {
            "self_attn": multihead_attention(sd, f"{p}.self_attn"),
            "linear1": linear(sd, f"{p}.linear1"),
            "linear2": linear(sd, f"{p}.linear2"),
            "norm1": layernorm(sd, f"{p}.norm1"),
            "norm2": layernorm(sd, f"{p}.norm2"),
        }
    return params


def vit_transformer(sd: Mapping[str, Any], depth: int,
                    prefix: str = "") -> dict:
    """Reference-style pre-norm ViT transformer (src/models/vit.py:60-75)
    state_dict → ``ViTTransformer`` params.

    Expects the reference naming: ``layers.{i}.0.norm / layers.{i}.0.fn.to_qkv
    / layers.{i}.0.fn.to_out.0`` for attention and ``layers.{i}.1.*`` with
    ``fn.net.0 / fn.net.3`` for the feed-forward, plus a trailing ``norm``.
    """
    p = prefix + "." if prefix else ""
    params: dict = {}
    for i in range(depth):
        attn = {"to_qkv": linear(sd, f"{p}layers.{i}.0.fn.to_qkv")}
        if f"{p}layers.{i}.0.fn.to_out.0.weight" in sd:
            attn["to_out"] = linear(sd, f"{p}layers.{i}.0.fn.to_out.0")
        params[f"attn_norm_{i}"] = layernorm(sd, f"{p}layers.{i}.0.norm")
        params[f"attn_{i}"] = attn
        params[f"ff_norm_{i}"] = layernorm(sd, f"{p}layers.{i}.1.norm")
        params[f"ff_{i}"] = {
            "fc1": linear(sd, f"{p}layers.{i}.1.fn.net.0"),
            "fc2": linear(sd, f"{p}layers.{i}.1.fn.net.3"),
        }
    params["norm"] = layernorm(sd, f"{p}norm")
    return params
