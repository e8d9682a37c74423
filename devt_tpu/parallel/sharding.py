"""Tensor-parallel partitioning rules for the model family.

The reference's layers are small enough to replicate (largest is
2048×2048, src/models/transformer.py:40), but the sharding API exposes a
``model`` mesh axis so heads/FFN *can* shard (SURVEY.md §2.8 "TP" row):

  * fused qkv / in_proj kernels  (d, 3d)  → shard output dim (head-parallel)
  * attention output projections (d, d)   → shard input dim (row-parallel)
  * FFN up-projections           (d, f)   → shard output dim
  * FFN down-projections         (f, d)   → shard input dim
  * everything else (norms, embeds, convs, heads) → replicated

With these specs GSPMD inserts exactly the classic Megatron pattern: an
all-reduce after the attention out-projection and after the FFN down
projection, riding ICI.  Rules match by parameter *path name*, so they
apply to every transformer in the family (TorchTransformerEncoder and
ViTTransformer naming).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from devt_tpu.parallel.mesh import MODEL_AXIS

# (path-substring, kernel PartitionSpec) — first match wins.
_RULES: tuple[tuple[str, P], ...] = (
    ("in_proj/kernel", P(None, MODEL_AXIS)),
    ("to_qkv/kernel", P(None, MODEL_AXIS)),
    ("out_proj/kernel", P(MODEL_AXIS, None)),
    ("to_out/kernel", P(MODEL_AXIS, None)),
    ("linear1/kernel", P(None, MODEL_AXIS)),
    ("linear2/kernel", P(MODEL_AXIS, None)),
    ("fc1/kernel", P(None, MODEL_AXIS)),   # ViT FeedForward up-proj
    ("fc2/kernel", P(MODEL_AXIS, None)),   # ViT FeedForward down-proj
    # switch-MoE experts (models/layers.py MoEViTBlock): shard the
    # leading expert axis — GSPMD then keeps the expert FFN einsums
    # fully local per shard and inserts one psum at the combine
    # contraction, i.e. expert parallelism over the model axis with no
    # bespoke collectives (router stays replicated by the default)
    ("moe_w1", P(MODEL_AXIS, None, None)),
    ("moe_b1", P(MODEL_AXIS, None)),
    ("moe_w2", P(MODEL_AXIS, None, None)),
    ("moe_b2", P(MODEL_AXIS, None)),
)


def _spec_for(path: str, ndim: int) -> P:
    if ndim < 2:
        return P()
    for key, spec in _RULES:
        if key in path:
            # Rank guard: optimizer states need not mirror their
            # parameter's rank (Adafactor factors a (d, f) kernel's
            # second moment into 1-D row/col vectors, and a 3-D moe_w*
            # moment into 2-D factors).  A spec longer than the leaf's
            # rank is invalid — such leaves replicate instead.
            return spec if len(spec) <= ndim else P()
    return P()


def _key_str(k) -> str:
    for attr in ("key", "name", "idx"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def param_partition_specs(params) -> Any:
    """Pytree of PartitionSpecs mirroring ``params``."""
    def to_spec(path, leaf):
        name = "/".join(_key_str(k) for k in path)
        return _spec_for(name, leaf.ndim)
    return jax.tree_util.tree_map_with_path(to_spec, params)


def shard_train_state(state, mesh: Mesh):
    """Place a whole TrainState under the TP rules: params by the Megatron
    specs AND the optimizer state's param-shaped moments (Adam mu/nu) on
    the SAME shards as their parameter.

    Placing the moments replicated while params are TP-sharded makes the
    compiled step's wanted shardings disagree with the placed ones — the
    SPMD partitioner then "involuntarily fully rematerializes" (replicate
    + re-partition) every moment tensor each step, per-step ICI/HBM churn
    for nothing.  The optax state's mu/nu pytrees carry the parameter
    paths (``…/mu/encoder_0/…/to_qkv/kernel``), so the same path-substring
    rules land each moment exactly where its parameter lives.

    On a mesh WITHOUT a ``model`` axis (the ``(data, pipe)`` PP mesh —
    parallel/mesh.make_mesh with pp > 1) the Megatron rules don't apply:
    the pp shard_map strategy takes the whole state replicated
    (``in_specs=P()``, train_step.py), so everything places replicated.
    The same goes for ANY mesh with a ``pipe`` axis — including the 3-D
    ``(data, pipe, model)`` mesh, whose pp_shard_map step also takes
    replicated state and carves TP shards locally inside the body
    (models/layers.ViTTransformer._tp_stage_fn); Megatron placement
    there would make jit reshard the whole tree every step.
    """
    from devt_tpu.parallel.pipeline import PIPE_AXIS

    tp = MODEL_AXIS in mesh.shape and PIPE_AXIS not in mesh.shape

    def place(path, leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        name = "/".join(_key_str(k) for k in path)
        spec = _spec_for(name, getattr(leaf, "ndim", 0)) if tp else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, state)


def shard_variables(variables, mesh: Mesh):
    """Place a variables pytree on the mesh: params by the TP rules
    (replicated over ``data``), everything else fully replicated.
    Meshes without a ``model`` axis (e.g. the PP ``(data, pipe)`` mesh)
    place everything replicated — same rationale as shard_train_state."""
    def place_params(spec_tree, tree):
        return jax.tree_util.tree_map(
            lambda leaf, spec: jax.device_put(
                leaf, NamedSharding(mesh, spec)),
            tree, spec_tree)

    from devt_tpu.parallel.pipeline import PIPE_AXIS

    out = dict(variables)
    if "params" in out:
        tp = MODEL_AXIS in mesh.shape and PIPE_AXIS not in mesh.shape
        specs = (param_partition_specs(out["params"]) if tp
                 else jax.tree_util.tree_map(lambda _: P(), out["params"]))
        out["params"] = place_params(specs, out["params"])
    for coll in out:
        if coll == "params":
            continue
        out[coll] = jax.tree_util.tree_map(
            lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())),
            out[coll])
    return out
