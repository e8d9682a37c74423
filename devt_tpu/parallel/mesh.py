"""Mesh construction and common sharding specs."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

def make_mesh(dp: int = -1, mp: int = 1, devices=None) -> Mesh:
    """2-D ``(data, model)`` mesh.  ``dp=-1`` uses all devices / mp.

    On a multi-chip slice the axes ride ICI; XLA lowers the psum/all-gather
    that GSPMD inserts onto the torus links.  Execution strategy over the
    mesh is chosen per step by parallel/train_step.py: shard_map over
    ``data`` when mp == 1 (fused Pallas kernels stay hot per device),
    GSPMD with the Megatron rules when mp > 1.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        if n % mp:
            raise ValueError(f"{n} devices not divisible by mp={mp}")
        dp = n // mp
    if dp * mp > n:
        raise ValueError(f"mesh {dp}x{mp} exceeds {n} devices")
    grid = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_spec(ndim: int = 1) -> P:
    """Shard the leading (batch) axis over the data axis."""
    return P(DATA_AXIS, *([None] * (ndim - 1)))


def replicated_spec() -> P:
    return P()


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree with the leading axis over ``data``."""
    def place(x):
        return jax.device_put(x, NamedSharding(mesh, batch_spec(x.ndim)))
    return jax.tree_util.tree_map(place, batch)
