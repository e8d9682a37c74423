"""Fully-sharded data parallelism (ZeRO-3) over the ``data`` mesh axis.

The reference trains replicated on one GPU (src/main.py:87-88); plain DP
replicates parameters and Adam moments on every chip.  FSDP removes that
redundancy the TPU-native way: instead of hand-written gather/scatter
hooks (the torch-FSDP wrapper approach), every parameter, Adam moment,
and mutable-state leaf simply *lives sharded* over the data axis and XLA
GSPMD inserts the collectives —

  * an ``all_gather`` materialises each weight just-in-time for its
    fwd/bwd matmul (riding ICI, overlapped with compute by the XLA
    latency-hiding scheduler);
  * grads contract back with ``reduce_scatter`` so each device updates
    only its own parameter shard (the optimizer update is 1/n the work
    and 1/n the memory of replicated DP);
  * per-device memory for params + grads + Adam moments drops ~n× on an
    n-way mesh, which is what lets models larger than one chip's HBM
    train at all.

Sharding is chosen per leaf by *shape*, not name: the largest dimension
divisible by the mesh size carries the axis, everything else (biases,
norm scales, BN stats, scalars) stays replicated — their memory is
negligible and replicating them avoids padding collectives.  Because the
Adam moments mirror parameter shapes, the same rule lands them on the
same shard as their parameter, so the update is fully local.

Execution composes with the existing strategies (parallel/train_step.py):
FSDP is the ``gspmd`` trace with sharded-in state — "computation follows
data", no step-code changes.  ``config.dp_mode = "fsdp"`` opts a training
run in (devt_tpu/main.py builds the mesh; train/harness.py places the
state with :func:`shard_train_state`).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from devt_tpu.parallel.mesh import DATA_AXIS


def leaf_spec(shape, n_shards: int, axis: str = DATA_AXIS) -> P:
    """PartitionSpec sharding the largest dimension divisible by
    ``n_shards``; fully replicated when none divides (or for sub-matrix
    leaves, whose memory doesn't matter)."""
    if len(shape) < 2 or n_shards <= 1:
        return P()
    order = sorted(range(len(shape)), key=lambda i: shape[i], reverse=True)
    for i in order:
        if shape[i] >= n_shards and shape[i] % n_shards == 0:
            spec = [None] * len(shape)
            spec[i] = axis
            return P(*spec)
    return P()


def state_partition_specs(tree, n_shards: int,
                          axis: str = DATA_AXIS) -> Any:
    """Pytree of PartitionSpecs mirroring ``tree`` (a TrainState, a params
    dict, or any state pytree) under the FSDP shape rule."""
    return jax.tree_util.tree_map(
        lambda leaf: leaf_spec(getattr(leaf, "shape", ()), n_shards, axis),
        tree)


def shard_train_state(state, mesh: Mesh, axis: str = DATA_AXIS):
    """Place a TrainState (or any state pytree) fully sharded: params,
    Adam moments, and mutable collections all land distributed over the
    data axis per :func:`leaf_spec`.  The jitted gspmd step then keeps
    them sharded end to end (outputs inherit operand shardings)."""
    n = dict(mesh.shape).get(axis, 1)

    def place(leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        return jax.device_put(
            leaf, NamedSharding(mesh, leaf_spec(leaf.shape, n, axis)))

    return jax.tree_util.tree_map(place, state)
