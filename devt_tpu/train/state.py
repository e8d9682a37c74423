"""Train state: params + optimizer state + mutable model collections.

The JAX analogue of the Lightning module's implicit state (parameters,
optimiser, BatchNorm running stats).  A plain pytree so it jits, shards,
donates, and checkpoints cleanly.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    model_state: Any                 # e.g. {"batch_stats": ...}; {} if none
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_model_state=None) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            model_state=(self.model_state if new_model_state is None
                         else new_model_state),
            opt_state=new_opt_state,
        )

    @classmethod
    def create(cls, params, tx, model_state=None) -> "TrainState":
        import jax.numpy as jnp
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   model_state=model_state or {}, opt_state=tx.init(params),
                   tx=tx)
