"""Model construction by config string — the ``main.py`` dispatch.

Reproduces the reference's string dispatch (src/main.py:37-44):
``ptn``/``ptn_shared`` → SimpleTransformer-equivalent, ``lstm`` → the
LSTM baseline with its hard-coded hyperparameters (src/main.py:40-42),
the FrameTransformer variant strings → FrameTransformer, plus the models
the reference constructs directly (ViViT, TPN, contrastive, BasicMLP).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from devt_tpu.config import Config
from devt_tpu.models.basicmlp import BasicMLP
from devt_tpu.models.contrastive import ContrastiveEncoder
from devt_tpu.models.frame_transformer import VARIANTS as FT_VARIANTS
from devt_tpu.models.frame_transformer import FrameTransformer
from devt_tpu.models.lstm import LSTMRegressor
from devt_tpu.models.ptn import PTN
from devt_tpu.models.tpn import TPN
from devt_tpu.models.vivit import ViViT


def model_dtype(config: Config) -> jnp.dtype:
    return jnp.bfloat16 if config.precision == "bf16" else jnp.float32


def build_model(config: Config) -> nn.Module:
    name = config.model
    dtype = model_dtype(config)

    if name in ("ptn", "ptn_shared"):
        return PTN(input_dimension=config.input_dimension,
                   nhead=config.nhead, nhid=config.nhid,
                   nlayers=config.nlayers,
                   num_experts=len(config.experts),
                   seq_len=config.seq_len, n_classes=config.n_classes,
                   dropout=config.dropout, shared=name == "ptn_shared",
                   attention_impl=config.attention_impl, remat=config.remat,
                   dtype=dtype)

    if name == "lstm":
        # hard-coded at the reference dispatch site (src/main.py:40-42)
        return LSTMRegressor(n_features=4608, hidden_size=512, num_layers=4,
                             n_classes=15, dropout=0.2, dtype=dtype)

    if name in FT_VARIANTS:
        return FrameTransformer(model=name, seq_len=config.seq_len,
                                frame_len=config.frame_len,
                                n_classes=config.n_classes,
                                use_cls=bool(config.cls),
                                attention_impl=config.attention_impl,
                                remat=config.remat, dtype=dtype)

    if name == "vivit":
        # channels-last is the TPU-native layout and what the frame
        # pipeline emits; the reference's (B,T,C,H,W) is still accepted
        # by the model via channels_last=False at direct construction
        return ViViT(num_classes=config.n_classes,
                     num_frames=config.frame_len,
                     attention_impl=config.attention_impl,
                     channels_last=True,
                     moe_experts=config.moe_experts,
                     moe_every=config.moe_every,
                     moe_capacity_factor=config.moe_capacity_factor,
                     pipeline_stages=config.pp if config.pp > 1 else 0,
                     pipeline_microbatches=config.pp_microbatches,
                     sequence_parallel=config.sp > 1,
                     remat=config.remat, dtype=dtype)

    if name == "tpn":
        return TPN(num_class=config.n_classes, dtype=dtype)

    if name == "contrastive":
        return ContrastiveEncoder(input_shape=config.input_shape,
                                  hidden_layer=config.hidden_layer,
                                  projection_size=config.projection_size,
                                  output_shape=config.output_shape,
                                  dtype=dtype)

    if name == "basicmlp":
        return BasicMLP(input_shape=config.input_shape,
                        n_classes=config.token_embedding, dtype=dtype)

    raise ValueError(
        f"unknown model {name!r}; expected one of "
        f"ptn, ptn_shared, lstm, {', '.join(FT_VARIANTS)}, vivit, tpn, "
        f"contrastive, basicmlp")


def example_batch(config: Config, batch_size: int | None = None) -> dict[str, Any]:
    """Synthetic batch with the right shapes for ``config.model`` —
    channels-last layouts (see devt_tpu/data)."""
    import numpy as np

    rng = np.random.default_rng(config.seed)
    b = batch_size or config.batch_size
    s, f = config.seq_len, config.frame_len
    n = config.n_classes

    def multi_hot():
        lab = (rng.random((b, n)) < 0.2).astype(np.float32)
        lab[:, 5] = 1.0     # Drama fallback keeps rows non-empty
        return lab

    name = config.model
    if name in ("ptn", "ptn_shared"):
        return {"experts": rng.standard_normal(
                    (b, s, len(config.experts), config.input_dimension),
                    dtype=np.float32),
                "label": multi_hot()}
    if name == "lstm":
        return {"experts": rng.standard_normal((b, s, 4608), dtype=np.float32),
                "label": multi_hot()}
    if name in FT_VARIANTS:
        return {"img": rng.standard_normal((b, s, 224, 224, 3),
                                           dtype=np.float32),
                "vid": rng.standard_normal((b, s, f, 112, 112, 3),
                                           dtype=np.float32),
                "label": multi_hot()}
    if name == "vivit":
        if config.wire_format == "u8_tokens":
            # the native loader's pre-patchified token wire
            # (native.load_batch_u8_patches): uint8 (B, T, N, p*p*c),
            # normalized on device by data/device_norm.py
            return {"vid_tokens": rng.integers(
                        0, 256, (b, f, 196, 768), dtype=np.uint8),
                    "label": multi_hot()}
        return {"vid": rng.standard_normal((b, f, 224, 224, 3),
                                           dtype=np.float32),
                "label": multi_hot()}
    if name == "tpn":
        return {"img": rng.standard_normal((b, 20, 224, 224, 3),
                                           dtype=np.float32),
                "label": multi_hot()}
    if name == "contrastive":
        return {"x_i": rng.standard_normal((b, config.input_shape),
                                           dtype=np.float32),
                "x_j": rng.standard_normal((b, config.input_shape),
                                           dtype=np.float32),
                "label": multi_hot()}
    if name == "basicmlp":
        return {"experts": rng.standard_normal((b, config.input_shape),
                                               dtype=np.float32),
                "label": rng.integers(0, config.token_embedding, (b,))}
    raise ValueError(name)
