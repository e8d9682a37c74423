"""Layer-level parity against torch semantics.

Torch (CPU build) is available in the image; the torch modules built here
are constructed from torch primitives inside the test — weights are ported
through devt_tpu.utils.torch_port and outputs compared in eval mode.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from devt_tpu.models.layers import (GeluMlp, PositionalEncoding,
                                    sinusoidal_positional_encoding)
from devt_tpu.models.torch_encoder import TorchTransformerEncoder
from devt_tpu.utils import torch_port


def test_positional_encoding_matches_reference_formula():
    """The reference PE uses log(1000.0) — src/models/transformer.py:16-17."""
    d_model, max_len = 32, 14
    pe = torch.zeros(max_len, d_model)
    position = torch.arange(0, max_len).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, d_model, 2).float()
                         * (-math.log(1000.0) / d_model))
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)

    ours = sinusoidal_positional_encoding(max_len, d_model)
    np.testing.assert_allclose(ours, pe.numpy(), atol=1e-6)


def test_positional_encoding_module_adds_pe():
    mod = PositionalEncoding(d_model=16, dropout=0.5, max_len=8)
    x = jnp.ones((2, 8, 16))
    y = mod.apply({}, x, deterministic=True)
    expected = x + sinusoidal_positional_encoding(8, 16)[None]
    np.testing.assert_allclose(y, expected, atol=1e-6)


def test_torch_transformer_encoder_parity():
    """Port torch TransformerEncoder weights; logits must match ≤1e-3 rel."""
    torch.manual_seed(0)
    d_model, nhead, ff, nlayers = 64, 4, 128, 3
    layer = tnn.TransformerEncoderLayer(d_model, nhead, ff, dropout=0.5)
    enc = tnn.TransformerEncoder(layer, nlayers).eval()

    b, s = 2, 14
    x = torch.randn(s, b, d_model)  # torch is seq-major
    with torch.no_grad():
        ref = enc(x).permute(1, 0, 2).numpy()

    model = TorchTransformerEncoder(d_model, nhead, ff, nlayers,
                                    dropout=0.5, attention_impl="xla")
    params = torch_port.transformer_encoder(enc.state_dict(), nlayers)
    out = model.apply({"params": params},
                      jnp.asarray(x.permute(1, 0, 2).numpy()),
                      deterministic=True)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


def test_gelu_mlp_parity():
    torch.manual_seed(1)
    tmod = tnn.Sequential(
        tnn.Linear(96, 512), tnn.GELU(), tnn.Linear(512, 128), tnn.GELU(),
        tnn.Linear(128, 19)).eval()
    x = torch.randn(4, 96)
    with torch.no_grad():
        ref = tmod(x).numpy()

    sd = tmod.state_dict()
    params = {"fc0": torch_port.linear(sd, "0"),
              "fc1": torch_port.linear(sd, "2"),
              "fc2": torch_port.linear(sd, "4")}
    out = GeluMlp(features=(512, 128, 19)).apply(
        {"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_encoder_dropout_trains_stochastically():
    """Dropout path must differ across rng keys in train mode."""
    model = TorchTransformerEncoder(32, 2, 64, 1, dropout=0.5,
                                    attention_impl="xla")
    x = jnp.ones((1, 6, 32))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=False)["params"]
    y1 = model.apply({"params": params}, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    y2 = model.apply({"params": params}, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(y1, y2)
