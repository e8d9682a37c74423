"""Expert parallelism: switch-style MoE feed-forward over a mesh axis.

The reference has no mixture-of-experts — its "experts" are frozen
modality extractors (SURVEY §2.8 marks EP n/a for parity).  Like
ring_attention (SP) and pipeline (PP), this module supplies the scaling
axis the reference never had, TPU-native:

  * **top-1 (switch) routing with fixed capacity** — every shape is
    static under jit: each expert processes exactly ``C`` token slots,
    overflow tokens are dropped (their output falls back to the residual
    stream), empty slots compute on zeros.  No data-dependent shapes, no
    host round-trips.
  * **dispatch/combine as einsums** — the (T, E, C) one-hot dispatch
    tensor turns routing into two MXU contractions (the Shazeer
    formulation), not scatter/gather.
  * **expert parallelism via ``lax.all_to_all``** — with one (or more)
    experts per device over an ``expert`` mesh axis, tokens travel to
    their expert's device and back in two all-to-alls over ICI; expert
    params are sharded over the axis and never replicated.
  * **differentiable end to end** — einsum dispatch and all_to_all have
    exact VJPs, so ``jax.grad`` yields expert-sharded parameter
    gradients; the router's load-balancing auxiliary loss (fraction ×
    mean-prob, scaled by E) trains the gate toward uniform utilisation.
"""

from __future__ import annotations

import contextlib as _contextlib
import threading as _threading

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

EXPERT_AXIS = "expert"


def init_moe_params(rng, n_experts: int, d_model: int, d_hidden: int,
                    router_scale: float = 0.01) -> dict:
    """Param tree with a leading (E, ...) expert axis for the FFNs and a
    replicated router.  Shard the ``w1/b1/w2/b2`` leaves over the expert
    axis for expert-parallel execution."""
    k1, k2, k3 = jax.random.split(rng, 3)
    s1 = 1.0 / jnp.sqrt(d_model)
    s2 = 1.0 / jnp.sqrt(d_hidden)
    return {
        "router": jax.random.normal(k1, (d_model, n_experts)) * router_scale,
        "w1": jax.random.normal(k2, (n_experts, d_model, d_hidden)) * s1,
        "b1": jnp.zeros((n_experts, d_hidden)),
        "w2": jax.random.normal(k3, (n_experts, d_hidden, d_model)) * s2,
        "b2": jnp.zeros((n_experts, d_model)),
    }


def switch_route(x, w_router, n_experts: int, capacity: int, valid=None):
    """Top-1 routing with fixed per-expert capacity.

    x: (T, D) tokens.  Returns (dispatch (T, E, C) 0/1, combine
    (T, E, C) prob-weighted, aux_loss scalar).  Tokens beyond an
    expert's capacity get an all-zero dispatch row — their MoE output is
    zero (callers add the residual stream, so dropped tokens pass
    through unchanged, the standard switch semantics).

    ``valid`` (optional (T,) 0/1 mask): tokens marked 0 — e.g. the
    tile-alignment pads of models/vivit.py — are excluded up front: they
    never enter an expert's capacity queue (so pads cannot evict real
    tokens) and contribute nothing to the load-balance f/p statistics.
    """
    logits = x @ w_router                          # (T, E)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    gate = jnp.max(probs, axis=-1)                 # (T,)
    expert = jnp.argmax(probs, axis=-1)            # (T,)
    onehot = jax.nn.one_hot(expert, n_experts, dtype=jnp.float32)  # (T, E)
    if valid is not None:
        onehot = onehot * valid.astype(jnp.float32)[:, None]
    # position of each token within its expert's queue
    pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0          # (T, E)
    kept = (pos >= 0) & (pos < capacity)
    # slot index of each token within its expert's queue: only the chosen
    # expert's column can be kept, so the sum picks it out (0 elsewhere —
    # dropped tokens land on slot 0 but their dispatch row is zeroed by
    # the (onehot * kept) factor below)
    pos_oh = jax.nn.one_hot(
        jnp.where(kept, pos, 0.0).sum(axis=-1).astype(jnp.int32),
        capacity, dtype=jnp.float32)               # (T, C)
    dispatch = (onehot * kept)[:, :, None] * pos_oh[:, None, :]
    combine = dispatch * gate[:, None, None]
    # switch load-balance loss: E * sum_e f_e * p_e  (=1 at uniform),
    # statistics over the valid tokens only
    if valid is None:
        f = jnp.mean(onehot, axis=0)
        p = jnp.mean(probs, axis=0)
    else:
        v = valid.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(v), 1.0)
        f = jnp.sum(onehot, axis=0) / denom        # onehot already masked
        p = jnp.sum(probs * v[:, None], axis=0) / denom
    aux = n_experts * jnp.sum(f * p)
    return dispatch, combine, aux


def _expert_ffn(params_local, h):
    """(E_local, C', D) slots through each local expert's FFN.

    Compute follows the slot dtype (bf16 under the flagship precision —
    the expert matmuls are where the FLOPs are); the router/softmax/aux
    upstream stay f32.
    """
    dt = h.dtype
    h = jnp.einsum("ecd,edh->ech", h, params_local["w1"].astype(dt)) \
        + params_local["b1"].astype(dt)[:, None, :]
    h = jax.nn.gelu(h, approximate=True)
    return jnp.einsum("ech,ehd->ecd", h, params_local["w2"].astype(dt)) \
        + params_local["b2"].astype(dt)[:, None, :]


def moe_ffn_dense(params, x, capacity_factor: float = 1.25, valid=None,
                  group_size: int | None = None):
    """Single-device reference execution: all experts materialised.

    x: (T, D).  Returns (y (T, D), aux_loss).  The expert-parallel path
    reproduces this bit-for-bit given the same params and tokens.
    Dispatch/combine/expert einsums run in x.dtype (f32 in == the exact
    f32 formulation; bf16 in == MXU-rate expert compute, the standard
    MoE mixed-precision split — routing stays f32 either way).

    ``group_size``: route in independent groups of this many tokens
    (T must divide) with per-group capacity, the aux loss averaged over
    groups.  The global formulation's dispatch tensor is (T, E, C) with
    C ∝ T — **quadratic in T** (a B=32 ViViT batch is 10⁵ tokens; its
    global dispatch would be terabytes and OOMed the chip at compile,
    r4 bench log).  Grouped routing is linear in T and is also the
    semantics the expert-parallel path already has (per-shard capacity,
    :func:`moe_ffn_local`).  Callers with batch structure should group
    by row (models/layers.py MoEViTBlock routes per sequence row).
    """
    if group_size is not None and x.shape[0] != group_size:
        t, d = x.shape
        assert t % group_size == 0, (t, group_size)
        g = t // group_size
        per_group = (lambda xs, vs: moe_ffn_dense(
            params, xs, capacity_factor, valid=vs))
        if valid is None:
            y, aux = jax.vmap(lambda xs: per_group(xs, None))(
                x.reshape(g, group_size, d))
        else:
            y, aux = jax.vmap(per_group)(x.reshape(g, group_size, d),
                                         valid.reshape(g, group_size))
        return y.reshape(t, d), jnp.mean(aux)
    n_experts = params["router"].shape[-1]
    t = x.shape[0]
    capacity = max(int(t / n_experts * capacity_factor), 1)
    dispatch, combine, aux = switch_route(
        x, params["router"], n_experts, capacity, valid=valid)
    slots = jnp.einsum("tec,td->ecd", dispatch.astype(x.dtype), x)
    out = _expert_ffn(params, slots)
    y = jnp.einsum("tec,ecd->td", combine.astype(x.dtype), out)
    return y, aux


def moe_ffn_local(params_local, x_local, *, axis_name: str = EXPERT_AXIS,
                  n_experts: int, capacity_factor: float = 1.25,
                  valid_local=None):
    """Expert-parallel execution body — call INSIDE shard_map.

    Tokens are sharded over the expert axis (data-parallel style:
    ``x_local`` is this device's (T/n, D) shard); FFN params arrive as
    this device's (E/n, ...) expert shard with the router replicated.
    Two ``all_to_all``s move token slots to their expert's device and
    back.  Semantics match :func:`moe_ffn_dense` on the global batch
    with per-shard capacity (capacity is computed per token shard, so
    global behaviour equals the dense run on each shard independently).
    """
    t = x_local.shape[0]
    capacity = max(int(t / n_experts * capacity_factor), 1)
    dispatch, combine, aux = switch_route(
        x_local, params_local["router"], n_experts, capacity,
        valid=valid_local)
    # local slots for every expert: (E, C, D)
    slots = jnp.einsum("tec,td->ecd", dispatch.astype(x_local.dtype),
                       x_local)
    # tiled all_to_all: the expert axis (expert-major, n_local per device)
    # splits across devices; every device's slots for OUR experts arrive
    # concatenated along the capacity axis in source-device order →
    # (E_local, n_shards * C, D)
    recv = jax.lax.all_to_all(
        slots, axis_name, split_axis=0, concat_axis=1, tiled=True)
    out = _expert_ffn(params_local, recv)
    # return trip: the capacity axis splits back to source devices and the
    # received chunks stack expert-major along axis 0 → (E, C, D), the
    # exact inverse of the forward exchange
    back = jax.lax.all_to_all(
        out, axis_name, split_axis=1, concat_axis=0, tiled=True)
    y = jnp.einsum("tec,ecd->td", combine.astype(x_local.dtype), back)
    # aux is a per-shard mean — replicate like a loss term
    aux = jax.lax.pmean(aux, axis_name)
    return y, aux


def moe_ffn(mesh: Mesh, params, x, *, axis_name: str = EXPERT_AXIS,
            capacity_factor: float = 1.25, valid=None):
    """Jittable expert-parallel wrapper: tokens (T, D) sharded over the
    expert axis, FFN params sharded one-or-more experts per device,
    router replicated.  Returns (y (T, D), aux).  ``valid`` (optional
    (T,) 0/1, sharded with the tokens) masks pad tokens out of routing
    (see :func:`switch_route`)."""
    n_experts = params["router"].shape[-1]
    pspec = {"router": P(), "w1": P(axis_name), "b1": P(axis_name),
             "w2": P(axis_name), "b2": P(axis_name)}

    def body(p_local, xs, vs=None):
        return moe_ffn_local(p_local, xs, axis_name=axis_name,
                             n_experts=n_experts,
                             capacity_factor=capacity_factor,
                             valid_local=vs)

    if valid is not None:
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(pspec, P(axis_name), P(axis_name)),
            out_specs=(P(axis_name), P()))(params, x, valid)
    return jax.shard_map(body, mesh=mesh, in_specs=(pspec, P(axis_name)),
                         out_specs=(P(axis_name), P()))(params, x)


# ---------------------------------------------------------------------------
# Expert-parallel TRAINING over the data axis (config.moe_ep)
# ---------------------------------------------------------------------------

_ep_gate = _threading.local()


@_contextlib.contextmanager
def moe_ep_scope(axis_name: str, n_shards: int):
    """Trace-time context: the dp_shard_map step factories
    (parallel/train_step.py) set this around their shard_map trace when
    ``config.moe_ep`` is on, so ``MoEViTBlock`` (models/layers.py) knows
    its body executes inside a shard_map over ``axis_name`` with
    ``n_shards`` devices and routes its FFN through
    :func:`moe_ffn_ep_rows` — expert FLOPs sharded instead of every
    device materialising every expert.  Re-entrant, thread-local,
    scope-bounded (the pipeline_scope / tp_pallas_scope discipline)."""
    prev = getattr(_ep_gate, "val", None)
    _ep_gate.val = (axis_name, int(n_shards))
    try:
        yield
    finally:
        _ep_gate.val = prev


def active_moe_ep():
    """The (axis_name, n_shards) set by :func:`moe_ep_scope`, or None."""
    return getattr(_ep_gate, "val", None)


def moe_ffn_ep_rows(params, h, *, axis_name: str, n_shards: int,
                    capacity_factor: float = 1.25, valid=None):
    """Expert-parallel execution of the per-row-routed MoE FFN — call
    INSIDE shard_map over ``axis_name`` (the data axis doubles as the
    expert axis, the standard Switch training layout: E experts spread
    over the n DP devices).

    h: (G, S, D) — THIS device's sequence rows.  Routing, capacity and
    dispatch/combine are computed per row exactly like
    ``moe_ffn_dense(group_size=S)`` (the dense training path in
    models/layers.MoEViTBlock), so expert assignment is bit-identical;
    only the expert FFN compute moves: every row's (E, C, D) slot block
    travels to the expert owners via one tiled ``lax.all_to_all``, each
    device runs :func:`_expert_ffn` for its E/n experts on the global
    slot batch, and a second all_to_all brings the outputs home.  Per
    device the expert matmul work drops from E to E/n experts.

    Gradients: the all_to_all transpose routes every device's loss
    cotangents back to the expert owner, so each device's grad for the
    full (E, ...) expert leaves is the CROSS-DEVICE sum scattered into
    its own expert slice (zeros elsewhere) — the dp_shard_map body's
    ordinary grad pmean then reproduces the dense-DP update exactly
    (sum/n of disjoint slices == pmean of replicated dense grads).
    Parity is pinned by tests/test_moe.py.
    """
    g, s, d = h.shape
    n_experts = params["router"].shape[-1]
    assert n_experts % n_shards == 0, (n_experts, n_shards)
    e_local = n_experts // n_shards
    capacity = max(int(s / n_experts * capacity_factor), 1)

    def route(xs, vs):
        return switch_route(xs, params["router"], n_experts, capacity,
                            valid=vs)

    if valid is None:
        dispatch, combine, aux = jax.vmap(lambda xs: route(xs, None))(h)
    else:
        dispatch, combine, aux = jax.vmap(route)(h, valid)
    # per-row slots, then expert-major for the exchange: (E, G*C, D)
    slots = jnp.einsum("gsec,gsd->gecd", dispatch.astype(h.dtype), h)
    slots = slots.transpose(1, 0, 2, 3).reshape(n_experts, g * capacity, d)
    recv = jax.lax.all_to_all(
        slots, axis_name, split_axis=0, concat_axis=1, tiled=True)
    idx = jax.lax.axis_index(axis_name) * e_local
    loc = {k: jax.lax.dynamic_slice_in_dim(params[k], idx, e_local, 0)
           for k in ("w1", "b1", "w2", "b2")}
    out = _expert_ffn(loc, recv)            # (E/n, n*G*C, D)
    back = jax.lax.all_to_all(
        out, axis_name, split_axis=1, concat_axis=0, tiled=True)
    back = back.reshape(n_experts, g, capacity, d).transpose(1, 0, 2, 3)
    y = jnp.einsum("gsec,gecd->gsd", combine.astype(h.dtype), back)
    # aux is this shard's per-row mean; the step body pmeans it over the
    # data axis, matching the dense path's global row mean
    return y, jnp.mean(aux)
