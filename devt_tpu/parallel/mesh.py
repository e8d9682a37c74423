"""Mesh construction and common sharding specs."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# Set by make_mesh when the constructed mesh spans >1 device.  The
# attention "auto" dispatch consults this (ops/attention._auto_pallas_ok):
# a pallas_call is opaque to GSPMD, so once a real multi-device mesh is
# in play the auto tier must keep the GSPMD-shardable jnp formulations.
# Single-device work on a multi-chip host (no mesh built) keeps the
# fused kernels; explicit impl="pallas" always forces them.
multi_device_mesh_active: bool = False


def make_mesh(dp: int = -1, mp: int = 1, devices=None) -> Mesh:
    """2-D ``(data, model)`` mesh.  ``dp=-1`` uses all devices / mp.

    On a multi-chip slice the axes ride ICI; XLA lowers the psum/all-gather
    that GSPMD inserts onto the torus links.
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
    if dp * mp > 1:
        global multi_device_mesh_active
        multi_device_mesh_active = True
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
