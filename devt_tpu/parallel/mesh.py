"""Mesh construction and common sharding specs."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

def make_mesh(dp: int = -1, mp: int = 1, pp: int = 1, sp: int = 1,
              devices=None) -> Mesh:
    """2-D ``(data, model)`` mesh — ``(data, pipe)`` when ``pp > 1`` —
    or the full 3-D ``(data, pipe, model)`` mesh when both ``pp > 1``
    and ``mp > 1``.  ``dp=-1`` uses all devices / (mp·pp).

    On a multi-chip slice the axes ride ICI; XLA lowers the psum/all-gather
    that GSPMD inserts onto the torus links.  Execution strategy over the
    mesh is chosen per step by parallel/train_step.py: shard_map over
    ``data`` when mp == 1 (fused Pallas kernels stay hot per device),
    GSPMD with the Megatron rules when mp > 1, and the GPipe schedule
    over the ``pipe`` axis when pp > 1 (parallel/pipeline.py — composes
    with DP as shard_map over both axes).  On the 3-D mesh each pipeline
    stage runs as the Megatron TP block over ``model``
    (models/layers.ViTTransformer), so the two per-block psums ride the
    fastest-varying — i.e. physically adjacent — axis, while the GPipe
    ppermute hops the middle axis and the once-per-step DP grad pmean
    rides the outermost.

    ``sp > 1`` builds a ``(data, seq)`` mesh instead: the token axis of
    ViViT's space transformer shards over ``seq`` and attention runs the
    kv ring (parallel/ring_attention.py) — neighbour-ICI context
    parallelism; composes with dp only.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if sp > 1:
        if mp != 1 or pp != 1:
            raise ValueError("sp composes with dp only (mp=pp=1); got "
                             f"mp={mp} pp={pp} sp={sp}")
        from devt_tpu.parallel.ring_attention import SEQ_AXIS
        if dp == -1:
            if n % sp:
                raise ValueError(f"{n} devices not divisible by sp={sp}")
            dp = n // sp
        if dp * sp > n:
            raise ValueError(f"mesh {dp}x{sp} exceeds {n} devices")
        grid = np.asarray(devices[: dp * sp]).reshape(dp, sp)
        return Mesh(grid, (DATA_AXIS, SEQ_AXIS))
    if pp > 1:
        from devt_tpu.parallel.pipeline import PIPE_AXIS
        per = pp * mp
        if dp == -1:
            if n % per:
                raise ValueError(
                    f"{n} devices not divisible by pp*mp={per}")
            dp = n // per
        if dp * per > n:
            raise ValueError(f"mesh {dp}x{pp}x{mp} exceeds {n} devices")
        if mp > 1:
            grid = np.asarray(devices[: dp * pp * mp]).reshape(dp, pp, mp)
            return Mesh(grid, (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))
        grid = np.asarray(devices[: dp * pp]).reshape(dp, pp)
        return Mesh(grid, (DATA_AXIS, PIPE_AXIS))
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
