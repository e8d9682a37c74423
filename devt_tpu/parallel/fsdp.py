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

Execution (parallel/train_step.py): on an mp==1 data mesh,
``dp_mode="fsdp"`` runs the ``fsdp_shard_map`` strategy — the ZeRO-3
collectives written out explicitly inside ``jax.shard_map`` so the fused
Pallas kernels stay hot per device (the gspmd trace must disable them;
chip-measured 2.65× tier cost, BENCH_DETAIL fsdp_vivit_train):

  * :func:`gather_params` all_gathers each sharded leaf at the top of
    the loss function — and because ``all_gather``'s transpose is
    ``psum_scatter``, differentiating straight through it IS the
    reduce_scatter of gradients back to shards (one collective pair per
    step, the ZeRO-3 contract, no hand-written backward);
  * :func:`reduce_grads_to_shards` finishes the job: sharded leaves
    arrive as the psum_scatter *sum* over replicas (divide by n for the
    global-batch mean), replicated leaves (biases, norms) never crossed
    a collective and pmean;
  * the optimizer update then runs on the LOCAL param/moment shards —
    1/n the work and memory, exactly as the gspmd formulation.

Meshes with a >1 ``model`` axis (FSDP×TP) and runs with global-norm
gradient clipping stay on the gspmd trace (``clip_by_global_norm``
needs the full-tree norm, which GSPMD partitions correctly; the
shard_map body would compute a per-shard norm).  ``dp_mode =
"fsdp_gspmd"`` forces the gspmd trace explicitly.  ``config.dp_mode =
"fsdp"`` opts a training run in (devt_tpu/main.py builds the mesh;
train/harness.py places the state with :func:`shard_train_state`).
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


def train_state_specs(state, n_shards: int, axis: str = DATA_AXIS):
    """TrainState-shaped pytree of PartitionSpecs for the
    ``fsdp_shard_map`` strategy: params and optimizer state follow the
    shape rule, the step counter and mutable model collections (BatchNorm
    stats — small, and the step body pmeans them) stay replicated."""
    from jax.sharding import PartitionSpec as PS

    return state.replace(
        step=PS(),
        params=state_partition_specs(state.params, n_shards, axis),
        model_state=jax.tree_util.tree_map(lambda _: PS(),
                                           state.model_state),
        opt_state=state_partition_specs(state.opt_state, n_shards, axis))


def _sharded_dim(spec) -> int | None:
    for i, s in enumerate(spec):
        if s is not None:
            return i
    return None


def _map_with_specs(fn, tree, specs):
    """tree_map(fn, tree, specs) with the specs taken WHOLE at each leaf
    of ``tree`` — PartitionSpec is a tuple subclass, so a naive tree_map
    would flatten into the specs themselves."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    spec_leaves = treedef.flatten_up_to(specs)
    return jax.tree_util.tree_unflatten(
        treedef, [fn(l, s) for l, s in zip(leaves, spec_leaves)])


def gather_params(params, specs, axis: str = DATA_AXIS):
    """all_gather each sharded leaf back to full (call INSIDE shard_map).
    Differentiating through this IS the ZeRO-3 gradient reduce_scatter:
    ``all_gather``'s transpose is ``psum_scatter``, so the backward pass
    sums every replica's cotangent and scatters each shard to its owner
    — finish with :func:`reduce_grads_to_shards`."""
    def g(leaf, spec):
        dim = _sharded_dim(spec)
        if dim is None:
            return leaf
        return jax.lax.all_gather(leaf, axis, axis=dim, tiled=True)
    return _map_with_specs(g, params, specs)


def reduce_grads_to_shards(grads, specs, n_shards: int,
                           axis: str = DATA_AXIS):
    """Global-batch-mean gradients on the local shards (call INSIDE
    shard_map, after differentiating through :func:`gather_params`).
    Sharded leaves arrived as the psum_scatter SUM over replicas — scale
    by 1/n for the mean; replicated leaves never crossed a collective
    and carry only the local replica's gradient — pmean them."""
    def r(g, spec):
        if _sharded_dim(spec) is None:
            return jax.lax.pmean(g, axis)
        return g / n_shards
    return _map_with_specs(r, grads, specs)


def shard_train_state(state, mesh: Mesh, axis: str = DATA_AXIS):
    """Place a TrainState (or any state pytree) fully sharded: params and
    Adam moments land distributed over the data axis per
    :func:`leaf_spec` (TrainStates follow :func:`train_state_specs`, so
    placement always agrees with the ``fsdp_shard_map`` step's specs).
    The jitted step then keeps them sharded end to end (outputs inherit
    operand shardings)."""
    n = dict(mesh.shape).get(axis, 1)

    def place(leaf, spec=None):
        if not hasattr(leaf, "shape"):
            return leaf
        if spec is None:
            spec = leaf_spec(leaf.shape, n, axis)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    if hasattr(state, "params") and hasattr(state, "opt_state"):
        return _map_with_specs(place, state, train_state_specs(state, n,
                                                               axis))
    return jax.tree_util.tree_map(place, state)
