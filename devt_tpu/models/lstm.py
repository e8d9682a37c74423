"""LSTM baseline for expert sequences.

Capability twin of ``LSTMRegressor`` (src/models/LSTM.py:6-88): a 4-layer
LSTM (input 4608 → hidden 512, inter-layer dropout) whose last-timestep
hidden state feeds a Linear(hidden, 15) head; the reference applies
sigmoid + BCE in its steps (LSTM.py:55-57) — the step-loss lives in the
training harness here.

TPU-first: the recurrence is a ``flax.linen.RNN``/``lax.scan`` per layer —
sequential in time (inherent to LSTM) but fully batched on the MXU within
each step.  Constructed with the reference's hard-coded hyperparameters at
the ``main.py`` dispatch site (src/main.py:40-42).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class LSTMRegressor(nn.Module):
    n_features: int = 4608
    hidden_size: int = 512
    num_layers: int = 4
    n_classes: int = 15
    dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, S, n_features) → (B, n_classes) logits."""
        x = x.astype(self.dtype)
        for i in range(self.num_layers):
            rnn = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size,
                                              dtype=self.dtype),
                         name=f"lstm_{i}")
            x = rnn(x)
            # torch nn.LSTM applies dropout to every layer's output
            # except the last (src/models/LSTM.py:32-36).
            if i < self.num_layers - 1:
                x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return nn.Dense(self.n_classes, dtype=self.dtype,
                        name="linear")(x[:, -1])
