"""Pyramid transformer network over multi-modal expert streams.

Capability twin of the reference's ``SimpleTransformer``
(src/models/transformer.py:28-174), the "ptn"/"ptn_shared" models of
``main.py`` dispatch (src/main.py:37-38).

Semantics preserved:
  * input contract ``(batch, seq, experts, dim=2048)``
    (src/models/transformer.py:85,107);
  * ``add_pos_cls``: CLS-token prepend → sinusoidal PE (base 1000.0) →
    LayerNorm, shared across experts (src/models/transformer.py:74-82);
  * ``ptn``: one temporal transformer encoder *per expert stream*
    with separate weights, per-expert CLS extraction, CLS vectors summed
    across experts, LayerNorm+Linear head (src/models/transformer.py:106-133
    — the reference hard-codes two encoders ``transformer_encoder0/1``;
    the evident intent, one encoder per configured expert, is implemented);
  * ``ptn_shared``: one shared encoder for all expert streams, then the
    stacked per-expert CLS sequence runs through the shared encoder again
    with its own CLS (src/models/transformer.py:84-104 — the reference
    calls undefined ``self.expert_encoder``/``transformer_encoder`` in
    ``forward``; the two-stage shared-weights pyramid is the evident
    intent, see SURVEY.md §7 "reference bug triage");
  * BCE-with-logits on 15-genre multi-hot targets
    (src/models/transformer.py:35,54,135-143).

Deviation (documented): the reference's CLS token is a parameter of shape
``(1, batch_size, 2048)`` — one vector *per batch slot*
(src/models/transformer.py:52-53), which breaks for any other batch size.
Here it is a single shared ``(1, 1, dim)`` vector broadcast over the batch.

TPU-first notes: the per-expert loop is a static Python loop over a
compile-time expert count (unrolled by trace; each body is one fused
encoder stack); no data-dependent control flow.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from devt_tpu.models.layers import LN_EPS, PositionalEncoding
from devt_tpu.models.torch_encoder import TorchTransformerEncoder


class PTN(nn.Module):
    """Two-stage pyramid transformer (``model="ptn"`` / ``"ptn_shared"``)."""
    input_dimension: int = 2048
    nhead: int = 8
    nhid: int = 2048
    nlayers: int = 8
    num_experts: int = 3
    seq_len: int = 13          # scene tokens before the CLS prepend
    n_classes: int = 15
    dropout: float = 0.5
    shared: bool = False       # False = "ptn", True = "ptn_shared"
    attention_impl: str = "auto"
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.input_dimension
        self.position_encoder = PositionalEncoding(
            d, dropout=self.dropout, max_len=self.seq_len + 1,
            name="position_encoder")
        self.cls = self.param("cls", nn.initializers.uniform(scale=1.0),
                              (1, 1, d))
        self.norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")

        def encoder(name):
            return TorchTransformerEncoder(
                d, self.nhead, self.nhid, self.nlayers, dropout=self.dropout,
                attention_impl=self.attention_impl, remat=self.remat,
                dtype=self.dtype, name=name)

        if self.shared:
            self.encoders = (encoder("encoder_shared"),)
        else:
            self.encoders = tuple(
                encoder(f"encoder_{i}") for i in range(self.num_experts))

        self.head_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                      name="head_norm")
        self.head = nn.Dense(self.n_classes, dtype=self.dtype, name="head")

    def add_pos_cls(self, x, deterministic: bool):
        """(B, S, D) → (B, S+1, D): CLS prepend, PE, LayerNorm
        (src/models/transformer.py:74-82)."""
        b = x.shape[0]
        cls = jnp.broadcast_to(self.cls.astype(x.dtype),
                               (b, 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        x = self.position_encoder(x, deterministic=deterministic)
        return self.norm(x)

    def __call__(self, experts, deterministic: bool = True):
        """experts: (B, S, E, D) → (B, n_classes) logits."""
        b, s, e, d = experts.shape
        assert e == self.num_experts, (
            f"expected {self.num_experts} expert streams, got {e}")

        cls_list = []
        for i in range(e):
            enc = self.encoders[0] if self.shared else self.encoders[i]
            h = self.add_pos_cls(experts[:, :, i, :], deterministic)
            h = enc(h, deterministic=deterministic)
            cls_list.append(h[:, 0])                  # per-expert CLS

        stacked = jnp.stack(cls_list, axis=1)          # (B, E, D)
        if self.shared:
            # second shared pass over the expert-CLS sequence
            # (src/models/transformer.py:98-102)
            h = self.add_pos_cls(stacked, deterministic)
            h = self.encoders[0](h, deterministic=deterministic)
            pooled = h[:, 0]
        else:
            # sum expert CLS vectors (src/models/transformer.py:130)
            pooled = jnp.sum(stacked, axis=1)

        return self.head(self.head_norm(pooled))
