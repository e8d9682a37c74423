"""GPipe-style pipeline parallelism over a mesh axis.

The reference trains depth ≤ 6 models on a single GPU — there is no
pipeline dimension to port (SURVEY §2.8 marks PP "not built" in the
reference).  This module is the scaling-headroom implementation for
deeper stacks, the same role ring_attention.py plays for long sequences:
a stack of identical blocks is partitioned into S stages over a ``pipe``
mesh axis and microbatches stream through the classic GPipe fill/drain
schedule.

TPU-native shape:

  * one ``lax.scan`` over ``M + S - 1`` ticks — a static trip count, no
    data-dependent control flow under jit;
  * stage handoff via ``lax.ppermute`` to the ring neighbour — nearest-
    neighbour ICI traffic only (the same pattern ring attention rides);
  * every device runs the SAME block program every tick (pure SPMD).
    Bubble ticks compute on zero buffers; their outputs are masked to
    zero and never reach the loss, so they carry zero cotangent in the
    backward — no NaN hazards (LN/softmax/GELU of zeros are finite) and
    no wasted gradient;
  * ``lax.scan`` + ``ppermute`` + dynamic slices all have exact VJPs, so
    the pipelined BACKWARD falls out of ``jax.grad`` through the
    ``shard_map`` — the reverse schedule is the transpose of the forward
    ppermute ring.  ``jax.checkpoint`` on the block bounds residual
    memory to one microbatch activation per tick (the standard
    rematerialising-pipeline memory shape).

Composability: the pipe axis is just a mesh axis — a (data, pipe) mesh
runs shard_map DP outside and this schedule inside, exactly like the
``ring_vit_block`` sequence-parallel leg.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"

_pp_gate = threading.local()


@contextlib.contextmanager
def pipeline_scope(mesh: Mesh):
    """Trace-time context: the pp train/eval step factories
    (parallel/train_step.py) set this around their shard_map trace so
    ``ViTTransformer`` (models/layers.py) knows its body is executing
    inside a shard_map with a ``pipe`` axis and routes its stacked block
    stack through :func:`pipeline_apply`.  Re-entrant, thread-local,
    scope-bounded — same discipline as ops/attention.pallas_disabled."""
    prev = getattr(_pp_gate, "mesh", None)
    _pp_gate.mesh = mesh
    try:
        yield
    finally:
        _pp_gate.mesh = prev


def active_pipe_mesh():
    """The mesh set by :func:`pipeline_scope`, or None."""
    return getattr(_pp_gate, "mesh", None)


def stage_params(stacked_local) -> Any:
    """Strip the sharded leading stage axis inside the shard_map body:
    each device's local shard of a ``(S, ...)``-stacked param tree has
    leading extent 1."""
    return jax.tree_util.tree_map(lambda x: x[0], stacked_local)


def pipeline_apply(block_fn: Callable, params_local, x_micro, *,
                   axis_name: str = PIPE_AXIS, n_stages: int,
                   remat: bool = True):
    """GPipe schedule body — call INSIDE ``shard_map`` over the pipe axis.

    ``block_fn(params, x) -> y``: one stage's computation (same shape in
    and out).  ``params_local``: THIS device's stage parameters (see
    :func:`stage_params`).  ``x_micro``: the replicated microbatch stream
    ``(M, mb, ...)`` — stage 0 consumes it; later stages receive
    activations over the ring.  Returns the replicated ``(M, mb, ...)``
    output stream (stage S-1's results, psum-broadcast).
    """
    s_idx = jax.lax.axis_index(axis_name)
    n_micro = x_micro.shape[0]
    n_ticks = n_micro + n_stages - 1
    fn = jax.checkpoint(block_fn) if remat else block_fn
    is_first = s_idx == 0
    is_last = s_idx == n_stages - 1
    send = [(i, i + 1) for i in range(n_stages - 1)]

    def tick(carry, t):
        buf, out = carry
        # stage 0 reads microbatch t from the input stream; other stages
        # read the activation their predecessor sent last tick
        x_t = jax.lax.dynamic_index_in_dim(
            x_micro, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
        x_in = jnp.where(is_first, x_t, buf)
        # does this device hold a real microbatch this tick?
        valid = (t >= s_idx) & (t < s_idx + n_micro)
        x_in = jnp.where(valid, x_in, jnp.zeros_like(x_in))
        y = fn(params_local, x_in)
        y = jnp.where(valid, y, jnp.zeros_like(y))
        # the last stage banks microbatch t-(S-1); everyone else banks
        # zeros (psum after the scan selects the last stage's stream)
        y_bank = jnp.where(is_last, y, jnp.zeros_like(y))
        out = jax.lax.dynamic_update_index_in_dim(
            out, y_bank, jnp.clip(t - (n_stages - 1), 0, n_micro - 1), 0)
        # hand the activation to the next stage (ring neighbour); devices
        # with no sender (stage 0) receive zeros
        nxt = jax.lax.ppermute(y, axis_name, send) if send else y
        return (nxt, out), None

    # the carry is device-varying (stage index enters every tick) — mark
    # the zero init as varying over the pipe axis so scan's type check
    # accepts the first iteration's output
    def _varying(v):
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(v, (axis_name,), to="varying")
        return jax.lax.pvary(v, (axis_name,))

    buf0 = _varying(jnp.zeros_like(x_micro[0]))
    out0 = _varying(jnp.zeros_like(x_micro))
    (_, out), _ = jax.lax.scan(tick, (buf0, out0), jnp.arange(n_ticks))
    # replicate stage S-1's output stream to every stage
    return jax.lax.psum(out, axis_name)


def pipelined_stack(mesh: Mesh, block_fn: Callable, stacked_params, x,
                    n_micro: int, *, axis_name: str = PIPE_AXIS,
                    remat: bool = True):
    """Jittable wrapper: apply ``S = mesh.shape[axis_name]`` pipelined
    stages to ``x`` (batch-leading), microbatched ``n_micro``-way.

    ``stacked_params``: the param tree with a leading ``(S, ...)`` stage
    axis (as produced by ``jax.vmap(init)`` or stacking per-block trees)
    — sharded over the pipe axis by the shard_map in_spec, so each
    device materialises only its own stage.  Differentiable end to end:
    ``jax.grad`` through this function yields stage-sharded gradients
    for ``stacked_params`` and the standard gradient for ``x``.
    """
    n_stages = mesh.shape[axis_name]
    b = x.shape[0]
    assert b % n_micro == 0, (b, n_micro)
    xm = x.reshape((n_micro, b // n_micro) + x.shape[1:])

    def body(p_local, xm_rep):
        return pipeline_apply(block_fn, stage_params(p_local), xm_rep,
                              axis_name=axis_name, n_stages=n_stages,
                              remat=remat)

    out = jax.shard_map(
        body, mesh=mesh, in_specs=(P(axis_name), P()), out_specs=P())(
            stacked_params, xm)
    return out.reshape(x.shape)
