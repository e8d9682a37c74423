"""Jitted train/eval step factories with grad accumulation and DP/TP.

The reference's runtime is ``pl.Trainer`` on one GPU (src/main.py:87-88)
with grad accumulation and fp16 present only as commented intent
(src/main.py:85).  Here the step is a single compiled XLA program:

  * the whole fwd+bwd+update graph is one jit (donated state — in-place
    buffer reuse in HBM);
  * grad accumulation is a ``lax.scan`` over microbatches
    (``config.accum_steps``), FLOP-equivalent to the reference's
    ``accumulate_grad_batches=8``;
  * loss is computed in f32 while activations follow the model dtype
    (bf16 by default on TPU).

Multi-device execution picks one of two strategies per mesh shape:

  * **mp == 1 (pure data parallel)** — the step body runs under
    ``jax.shard_map`` over the ``data`` axis: params/opt state replicated,
    batch sharded, explicit ``lax.pmean`` of grads/loss over ICI.  Inside
    the shard_map body every shape is concrete per-device, so the fused
    Pallas kernels (ops/fused_block.py, ops/flash_attention.py) stay hot
    on every chip — scaling does not abandon the single-chip kernel path.
  * **mp > 1 (tensor parallel)** — GSPMD: the body is traced under
    ``pallas_disabled()`` so attention keeps the jnp formulations, which
    GSPMD partitions with the Megatron rules (parallel/sharding.py); the
    psum after to_out/fc2 rides ICI.  (A pallas_call is opaque to GSPMD —
    sharded operands cannot partition into the kernel.)

With equal shard sizes the DP shard_map step is numerically identical to
the single-device global-batch step for per-sample losses (pmean of
shard-mean losses/grads == global mean), and for the contrastive loss via
an explicit all-gather (train/steps.py).  Conv-backbone BatchNorm models
compute per-replica batch stats (torch-DDP default semantics; running
stats are pmean'd); the contrastive encoder opts into cross-replica
SyncBN (``bn_sync_axis``) so the global-negatives loss is exact.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from devt_tpu.config import Config
from devt_tpu.ops.attention import pallas_disabled
from devt_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from devt_tpu.train.state import TrainState
from devt_tpu.train.steps import forward_and_loss

_SCALAR_AUX = ("base_loss", "distil_loss", "cossim", "moe_aux")


def _split_microbatches(batch, accum: int):
    def split(x):
        b = x.shape[0]
        assert b % accum == 0, f"batch {b} not divisible by accum {accum}"
        return x.reshape((accum, b // accum) + x.shape[1:])
    return jax.tree_util.tree_map(split, batch)


def _tp_scope_for(mesh, config: Config | None):
    """Context factory for a gspmd trace: when the mesh has a >1 model
    axis and attention is on ``"auto"``, ViT blocks route through the
    Megatron shard_map block (parallel/tp_block.py) so the fused Pallas
    MHA kernel stays hot per device — everything else still traces under
    ``pallas_disabled()`` and shards via the GSPMD partition rules."""
    import contextlib

    from devt_tpu.ops.attention import tp_pallas_scope

    tp_on = (mesh is not None
             and dict(mesh.shape).get(MODEL_AXIS, 1) > 1
             and (config is None or config.attention_impl == "auto"))
    if tp_on:
        return lambda: tp_pallas_scope(mesh)
    return contextlib.nullcontext


def mesh_strategy(mesh, config: Config | None = None) -> str:
    """Execution strategy for a mesh: ``single`` | ``dp_shard_map`` |
    ``fsdp_shard_map`` | ``pp_shard_map`` | ``gspmd``.  A mesh with a >1
    ``pipe`` axis runs the GPipe schedule (parallel/pipeline.py) inside a
    shard_map over both axes.  ``config.dp_mode`` can force ``gspmd`` for
    an mp==1 mesh (escape hatch), or pick ``fsdp`` (ZeRO-3: the state
    lives sharded over data — parallel/fsdp.py — and runs the explicit
    gather/reduce_scatter shard_map body so the fused Pallas kernels stay
    hot; ``fsdp_gspmd`` keeps the gspmd-trace formulation, which is also
    where fsdp falls back when global-norm grad clipping is on — the
    shard_map body would compute a per-shard norm); ``auto`` picks
    shard_map so the Pallas kernels survive scaling."""
    if mesh is None or mesh.size == 1:
        return "single"
    shape = dict(mesh.shape)
    from devt_tpu.parallel.pipeline import PIPE_AXIS
    if shape.get(PIPE_AXIS, 1) > 1:
        return "pp_shard_map"
    from devt_tpu.parallel.ring_attention import SEQ_AXIS
    if shape.get(SEQ_AXIS, 1) > 1:
        return "sp_shard_map"
    if shape.get(MODEL_AXIS, 1) > 1 or DATA_AXIS not in shape:
        return "gspmd"
    mode = getattr(config, "dp_mode", "auto") if config is not None \
        else "auto"
    if mode == "fsdp":
        clip = getattr(config, "grad_clip_norm", 0.0)
        # Adafactor's factored second moments are cross-row/col
        # statistics of the FULL parameter — the explicit shard_map
        # formulation updates each local shard independently, which
        # would factor over local rows only and diverge from the dense
        # trainer.  The gspmd trace partitions the factored update
        # correctly (state still lives sharded via fsdp.shard_train_state).
        adafactor = getattr(config, "opt", "adamW") == "adafactor"
        return ("gspmd" if (clip and clip > 0.0) or adafactor
                else "fsdp_shard_map")
    if mode in ("gspmd", "fsdp_gspmd"):
        return "gspmd"
    return "dp_shard_map"


def _pmean_floats(tree, axis_name: str):
    """pmean floating leaves across replicas; non-float leaves (none in
    practice — BN stats are float) pass through."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.pmean(x, axis_name)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def _gspmd_sharding_hooks(mesh, config: Config | None):
    """``(constrain_params, constrain_grads)`` for the gspmd strategies.

    Left alone, the SPMD partitioner picks shardings for the fwd/bwd use
    of each kernel by propagation (e.g. head-split projections from the
    attention reshape) that disagree with where the state was placed
    (parallel/sharding.py TP rules, parallel/fsdp.py shape rule) — and
    resolves the conflict by involuntarily fully rematerializing the
    params and every Adam moment tensor each step.

    * **fsdp**: the canonical ZeRO-3 pattern made explicit — params are
      constrained to replicated at the point of use (ONE clean all_gather
      per step, which is the ZeRO-3 contract: gathered for compute,
      sharded at rest) and gradients are constrained back to the param
      shards (a reduce_scatter), so the optimizer update is elementwise
      local and the state stays sharded end to end.
    * **TP/gspmd**: gradients are pinned to the Megatron partition specs
      their params/moments were placed with, so the update stays local.

    Both rule sets are pure (shape or path) functions, so the specs are
    computable from the tree at trace time.
    """
    if mesh is None:
        return None, None
    from jax.sharding import NamedSharding

    if config is not None and getattr(config, "dp_mode", "auto") in (
            "fsdp", "fsdp_gspmd"):
        from devt_tpu.parallel.fsdp import leaf_spec
        n = dict(mesh.shape).get(DATA_AXIS, 1)

        def gather(params):
            return jax.tree_util.tree_map(
                lambda p: jax.lax.with_sharding_constraint(
                    p, NamedSharding(mesh, P())), params)

        def pin(grads):
            return jax.tree_util.tree_map(
                lambda g: jax.lax.with_sharding_constraint(
                    g, NamedSharding(mesh, leaf_spec(g.shape, n))), grads)
        return gather, pin

    from devt_tpu.parallel.sharding import param_partition_specs

    def pin(grads):
        specs = param_partition_specs(grads)
        return jax.tree_util.tree_map(
            lambda g, s: jax.lax.with_sharding_constraint(
                g, NamedSharding(mesh, s)), grads, specs)
    return None, pin


def _moe_ep_scope_for(mesh, config: Config | None):
    """Context factory for the dp_shard_map trace: ``config.moe_ep``
    activates expert-parallel MoE routing (parallel/moe.moe_ep_scope) so
    MoEViTBlock shards its expert FFNs over the data axis."""
    import contextlib

    if (config is not None and getattr(config, "moe_ep", False)
            and mesh is not None):
        n = dict(mesh.shape).get(DATA_AXIS, 1)
        if n > 1:
            from devt_tpu.parallel.moe import moe_ep_scope
            return lambda: moe_ep_scope(DATA_AXIS, n)
    return contextlib.nullcontext


def _make_step_body(model, config: Config,
                    axis_name: str | None = None,
                    constrain_params: Callable | None = None,
                    constrain_grads: Callable | None = None,
                    pipe_axis: str | None = None,
                    tp_axis: str | None = None,
                    seq_axis: str | None = None,
                    reduce_grads: Callable | None = None) -> Callable:
    """Un-jitted ``(state, batch, rng) -> (state, metrics)`` — one full
    fwd+bwd+update.  Shared by the single-step and multi-step executors.

    With ``axis_name`` set the body is a shard_map DP replica: the rng is
    decorrelated per replica (distinct dropout masks, as a global-batch
    mask would give) and grads/loss/model-state are pmean'd over ICI
    before the update, so every replica applies the identical
    global-batch update to its replicated params.

    With ``pipe_axis`` set the body also runs inside a GPipe shard_map
    (state replicated over the pipe axis; each pipe device's backward
    produces nonzero grads only for ITS stage's slice of the stacked
    "pb_*" block params): stacked grads psum over the pipe axis to
    reassemble the full stack, everything else — computed identically on
    every pipe device — pmeans.

    With ``tp_axis`` additionally set (the 3-D dp×pp×tp mesh) each stage
    executed as the Megatron TP block: the five column/row-sliced weight
    leaves (wqkv/wo/w1/bb1/w2) carry per-device grads that are nonzero
    only on that device's model shard — a model-axis psum reassembles
    them — while LN scales/offsets and post-psum biases, touched through
    replicated activations, pmean (identical across the axis).

    With ``seq_axis`` set (the (data, seq) SP mesh) the reduction is a
    UNIFORM pmean over the axis for every grad leaf: the sp stack's
    closing all_gather transposes to a psum_scatter whose cross-device
    sum contributes exactly the n× factor pmean's 1/n cancels for
    params upstream of the gather (per-chunk partial grads), while
    params downstream of it carry identical replicated grads
    (models/layers.ViTTransformer._sp_stack).
    """
    accum = max(config.accum_steps, 1)

    def loss_fn(params, model_state, batch, rng):
        if constrain_params is not None:
            params = constrain_params(params)
        variables = {"params": params, **model_state}
        loss, aux, new_model_state = forward_and_loss(
            model, config, variables, batch, rng, train=True,
            axis_name=axis_name)
        return loss, (aux, new_model_state)

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        if accum == 1:
            (loss, (aux, new_ms)), grads = grad_fn(
                state.params, state.model_state, batch, rng)
            aux = {k: aux[k] for k in _SCALAR_AUX
                   if isinstance(aux, dict) and k in aux}
        else:
            micro = _split_microbatches(batch, accum)

            def body(carry, mb_rng):
                grads_acc, loss_acc, ms = carry
                mb, r = mb_rng
                (l, (a, new_ms)), g = grad_fn(state.params, ms, mb, r)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, g)
                ys = {k: a[k] for k in _SCALAR_AUX if k in a}
                return (grads_acc, loss_acc + l, new_ms), ys

            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            carry0 = (zero_grads, jnp.float32(0.0), state.model_state)
            rngs = jax.random.split(rng, accum)
            (grads, loss, new_ms), stacked_aux = jax.lax.scan(
                body, carry0, (micro, rngs))
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            loss = loss / accum
            # per-model scalar diagnostics survive accumulation as the
            # microbatch mean (ADVICE r1: they used to vanish exactly in
            # the large-batch configs that need accumulation)
            aux = {k: jnp.mean(v) for k, v in stacked_aux.items()}

        if axis_name is not None:
            # the DDP reduction, explicit: grad/loss pmean over ICI.
            # ``reduce_grads`` overrides the grad pmean for bodies whose
            # params are sharded (fsdp_shard_map: sharded leaves already
            # collected their cross-replica sum via the all_gather
            # transpose — a pmean of DIFFERENT shards would be wrong)
            grads = (reduce_grads(grads) if reduce_grads is not None
                     else jax.lax.pmean(grads, axis_name))
            loss = jax.lax.pmean(loss, axis_name)
            aux = {k: jax.lax.pmean(v, axis_name) for k, v in aux.items()}
            new_ms = _pmean_floats(new_ms, axis_name)

        if pipe_axis is not None:
            from jax.tree_util import tree_map_with_path

            tp_sliced = {"pb_wqkv", "pb_wo", "pb_w1", "pb_bb1", "pb_w2"}

            def red(path, g):
                keys = [str(getattr(p, "key", "")) for p in path]
                stage_sharded = any(k.startswith("pb_") for k in keys)
                g = jax.lax.psum(g, pipe_axis) if stage_sharded \
                    else jax.lax.pmean(g, pipe_axis)
                if tp_axis is not None:
                    g = jax.lax.psum(g, tp_axis) \
                        if any(k in tp_sliced for k in keys) \
                        else jax.lax.pmean(g, tp_axis)
                return g

            grads = tree_map_with_path(red, grads)
            axes = (pipe_axis,) if tp_axis is None else (pipe_axis, tp_axis)
            loss = jax.lax.pmean(loss, axes)
            aux = {k: jax.lax.pmean(v, axes) for k, v in aux.items()}
            for ax in axes:
                new_ms = _pmean_floats(new_ms, ax)

        if seq_axis is not None:
            grads = jax.lax.pmean(grads, seq_axis)
            loss = jax.lax.pmean(loss, seq_axis)
            aux = {k: jax.lax.pmean(v, seq_axis) for k, v in aux.items()}
            new_ms = _pmean_floats(new_ms, seq_axis)

        if constrain_grads is not None:
            grads = constrain_grads(grads)
        new_state = state.apply_gradients(grads, new_ms)
        metrics = {"loss": loss, **aux}
        return new_state, metrics

    return train_step


def _sync_bn(model):
    """Models exposing a ``bn_sync_axis`` knob (the contrastive encoder)
    get cross-replica SyncBN under the shard_map DP step: Flax BatchNorm
    psums batch stats over the data axis, so the global-negatives
    NT-Xent loss sees the same activations as a single-device
    global-batch step.  Conv backbones keep per-replica batch stats
    (torch-DDP default semantics)."""
    if getattr(model, "bn_sync_axis", "absent") is None:
        return model.clone(bn_sync_axis=DATA_AXIS)
    return model


def _shard_map_dp(fn: Callable, mesh, batch_spec: P) -> Callable:
    """Wrap a ``(state, batch, rng) -> (state, metrics)`` body in
    shard_map over the data axis: state/rng replicated, batch sharded,
    outputs replicated (the body pmeans everything cross-replica).

    ``check_vma=False``: the body calls ``pallas_call`` kernels whose
    out-shapes carry no varying-mesh-axes annotation (jax's vma checker
    rejects them), and the replication of the outputs is established by
    the body's explicit pmeans — which the parity tests verify against
    the single-device step rather than relying on the static checker.
    """
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()), check_vma=False)


def _make_fsdp_shard_map(model, config: Config, mesh,
                         n_steps: int | None) -> Callable:
    """ZeRO-3 inside ``jax.shard_map`` — the fused-Pallas FSDP step.

    The state arrives sharded over ``data`` (parallel/fsdp.py
    ``shard_train_state``).  Each device all_gathers its param shards at
    the top of the loss function (``gather_params``); because
    ``all_gather``'s transpose is ``psum_scatter``, the backward pass IS
    the gradient reduce_scatter — ``reduce_grads_to_shards`` just fixes
    the sum→mean scale and pmeans the replicated leaves.  The optimizer
    then updates only the LOCAL param/moment shards.  Since per-device
    shapes are concrete inside shard_map, the fused Pallas kernels serve
    the fwd/bwd exactly like the ``dp_shard_map`` strategy (the gspmd
    formulation must trace under ``pallas_disabled()`` — chip-measured
    2.65× step cost, BENCH_DETAIL fsdp_vivit_train).

    PartitionSpecs depend on leaf *shapes*, so the shard_map is built on
    first call from the actual TrainState and cached (one model/config
    per factory — the jit cache keys the rest).  ``n_steps`` switches
    the body to the lax.scan multi-step executor.
    """
    from devt_tpu.parallel import fsdp

    n = dict(mesh.shape)[DATA_AXIS]
    cache: dict = {}

    def build(state):
        specs = fsdp.train_state_specs(state, n)
        pspecs = specs.params
        body = _make_step_body(
            _sync_bn(model), config, axis_name=DATA_AXIS,
            constrain_params=lambda p: fsdp.gather_params(p, pspecs),
            reduce_grads=lambda g: fsdp.reduce_grads_to_shards(
                g, pspecs, n))
        if n_steps is None:
            fn, batch_spec = body, P(DATA_AXIS)
        else:
            def fn(st, batches, rng):
                def scan_body(carry, batch):
                    return body(carry, batch, rng)
                st, stacked = jax.lax.scan(scan_body, st, batches)
                return st, jax.tree_util.tree_map(
                    lambda v: jnp.mean(v, axis=0), stacked)
            batch_spec = P(None, DATA_AXIS)
        return jax.jit(
            jax.shard_map(fn, mesh=mesh,
                          in_specs=(specs, batch_spec, P()),
                          out_specs=(specs, P()), check_vma=False),
            donate_argnums=(0,))

    def step(state, batch, rng):
        if "fn" not in cache:
            cache["fn"] = build(state)
        return cache["fn"](state, batch, rng)

    return step


def make_train_step(model, config: Config, mesh=None) -> Callable:
    """Returns jitted ``train_step(state, batch, rng) -> (state, metrics)``.

    ``mesh`` selects the multi-device strategy (see module docstring);
    ``None`` or a 1-device mesh is the plain single-program path.
    """
    strategy = mesh_strategy(mesh, config)
    if strategy == "dp_shard_map":
        body = _make_step_body(_sync_bn(model), config, axis_name=DATA_AXIS)
        fn = _shard_map_dp(body, mesh, P(DATA_AXIS))
        ep_scope = _moe_ep_scope_for(mesh, config)

        def dp_traced(state, batch, rng):
            # scope active while the shard_map body traces: config.moe_ep
            # routes MoEViTBlock through the expert-parallel FFN
            with ep_scope():
                return fn(state, batch, rng)
        return jax.jit(dp_traced, donate_argnums=(0,))
    if strategy == "fsdp_shard_map":
        return _make_fsdp_shard_map(model, config, mesh, n_steps=None)
    if strategy == "sp_shard_map":
        from devt_tpu.parallel.ring_attention import SEQ_AXIS, sp_scope

        body = _make_step_body(model, config, axis_name=DATA_AXIS,
                               seq_axis=SEQ_AXIS)

        def sp_traced(state, batch, rng):
            # scope active while the shard_map body traces, so the
            # model's ViTTransformer routes its stacked stack through
            # the kv ring on locally-sliced tokens (models/layers.py)
            with sp_scope(mesh):
                return jax.shard_map(
                    body, mesh=mesh,
                    in_specs=(P(), P(DATA_AXIS), P()),
                    out_specs=(P(), P()), check_vma=False)(
                        state, batch, rng)
        return jax.jit(sp_traced, donate_argnums=(0,))
    if strategy == "pp_shard_map":
        from devt_tpu.parallel.pipeline import PIPE_AXIS, pipeline_scope

        tp_ax = MODEL_AXIS \
            if dict(mesh.shape).get(MODEL_AXIS, 1) > 1 else None
        body = _make_step_body(model, config, axis_name=DATA_AXIS,
                               pipe_axis=PIPE_AXIS, tp_axis=tp_ax)

        def traced(state, batch, rng):
            # scope active while the shard_map body traces, so the model's
            # ViTTransformer routes its stacked stack through the GPipe
            # schedule (models/layers.py)
            with pipeline_scope(mesh):
                return jax.shard_map(
                    body, mesh=mesh,
                    in_specs=(P(), P(DATA_AXIS), P()),
                    out_specs=(P(), P()), check_vma=False)(
                        state, batch, rng)
        return jax.jit(traced, donate_argnums=(0,))
    if strategy == "gspmd":
        cp, cg = _gspmd_sharding_hooks(mesh, config)
        body = _make_step_body(model, config, constrain_params=cp,
                               constrain_grads=cg)
        tp_scope = _tp_scope_for(mesh, config)

        def traced(state, batch, rng):
            with tp_scope(), pallas_disabled():
                return body(state, batch, rng)
        return jax.jit(traced, donate_argnums=(0,))
    return jax.jit(_make_step_body(model, config), donate_argnums=(0,))


def make_multi_step(model, config: Config, n_steps: int,
                    mesh=None) -> Callable:
    """Returns jitted ``multi_step(state, batches, rng) -> (state, metrics)``
    running ``n_steps`` FULL train steps (each fwd+bwd+optimizer update) as
    one XLA program via ``lax.scan``.

    ``batches`` is a stacked batch tree with leading axis ``n_steps``.
    Host dispatch cost is paid once per n_steps — the command-buffer idea
    for backends where per-dispatch latency is material (the tunneled
    single-chip path here; the same shape works over DCN-attached hosts).
    The scan body compiles once, so compile time matches the single step.
    Per-step randomness still folds ``state.step`` into the rng, identical
    to n_steps separate calls.  Returned metrics are the scan-stacked
    per-step values reduced to their mean (loss curves stay visible at
    multi-step granularity).  Under a DP mesh the scan runs inside the
    shard_map replica, so the Pallas kernels serve every unrolled step.
    """
    strategy = mesh_strategy(mesh, config)
    if strategy == "fsdp_shard_map":
        return _make_fsdp_shard_map(model, config, mesh, n_steps=n_steps)
    axis = DATA_AXIS if strategy in ("dp_shard_map", "pp_shard_map",
                                     "sp_shard_map") else None
    if strategy == "dp_shard_map":
        model = _sync_bn(model)
    cp, cg = (_gspmd_sharding_hooks(mesh, config)
              if strategy == "gspmd" else (None, None))
    pipe = tp_ax = seq = None
    if strategy == "pp_shard_map":
        from devt_tpu.parallel.pipeline import PIPE_AXIS
        pipe = PIPE_AXIS
        tp_ax = MODEL_AXIS \
            if dict(mesh.shape).get(MODEL_AXIS, 1) > 1 else None
    if strategy == "sp_shard_map":
        from devt_tpu.parallel.ring_attention import SEQ_AXIS
        seq = SEQ_AXIS
    body = _make_step_body(model, config, axis_name=axis,
                           constrain_params=cp, constrain_grads=cg,
                           pipe_axis=pipe, tp_axis=tp_ax, seq_axis=seq)

    def multi_step(state: TrainState, batches, rng):
        def scan_body(carry, batch):
            new_state, metrics = body(carry, batch, rng)
            return new_state, metrics

        state, stacked = jax.lax.scan(scan_body, state, batches)
        return state, jax.tree_util.tree_map(
            lambda v: jnp.mean(v, axis=0), stacked)

    if strategy == "dp_shard_map":
        fn = _shard_map_dp(multi_step, mesh, P(None, DATA_AXIS))
        ep_scope = _moe_ep_scope_for(mesh, config)

        def dp_traced(state, batches, rng):
            with ep_scope():
                return fn(state, batches, rng)
        return jax.jit(dp_traced, donate_argnums=(0,))
    if strategy == "pp_shard_map":
        from devt_tpu.parallel.pipeline import pipeline_scope

        def traced(state, batches, rng):
            with pipeline_scope(mesh):
                return jax.shard_map(
                    multi_step, mesh=mesh,
                    in_specs=(P(), P(None, DATA_AXIS), P()),
                    out_specs=(P(), P()), check_vma=False)(
                        state, batches, rng)
        return jax.jit(traced, donate_argnums=(0,))
    if strategy == "sp_shard_map":
        from devt_tpu.parallel.ring_attention import sp_scope

        def sp_traced(state, batches, rng):
            with sp_scope(mesh):
                return jax.shard_map(
                    multi_step, mesh=mesh,
                    in_specs=(P(), P(None, DATA_AXIS), P()),
                    out_specs=(P(), P()), check_vma=False)(
                        state, batches, rng)
        return jax.jit(sp_traced, donate_argnums=(0,))
    if strategy == "gspmd":
        tp_scope = _tp_scope_for(mesh, config)

        def traced(state, batches, rng):
            with tp_scope(), pallas_disabled():
                return multi_step(state, batches, rng)
        return jax.jit(traced, donate_argnums=(0,))
    return jax.jit(multi_step, donate_argnums=(0,))


def make_eval_step(model, config: Config, mesh=None) -> Callable:
    """Returns jitted ``eval_step(state, batch) -> (loss, aux)`` — the
    validation/test step feeding the epoch-end evaluators.

    Strategy mirrors the train step.  On an mp==1 DP mesh the body runs
    under ``jax.shard_map`` over ``data`` — per-device shapes are
    concrete, so the fused Pallas kernels serve validation/test exactly
    like they serve training (r3 disabled them for EVERY mesh, so eval
    throughput regressed exactly when scaling).  Global-batch semantics
    are kept explicitly: the loss and scalar diagnostics are pmean'd,
    per-sample aux rows (probs/labels/embeddings) are all-gathered in
    batch order, and the contrastive negatives pool is the global batch
    via ``axis_name`` (train/steps.py).  FSDP meshes run the same
    shard_map body with a param all_gather prelude (state stays ZeRO-3
    sharded at rest; the fused kernels serve eval too).  TP meshes keep
    the GSPMD trace with the Pallas auto-tier disabled (sharded operands
    cannot partition into a pallas_call).
    """

    def eval_body(state: TrainState, batch, axis_name=None):
        variables = {"params": state.params, **state.model_state}
        loss, aux, _ = forward_and_loss(
            model, config, variables, batch, rng=None, train=False,
            axis_name=axis_name)
        return loss, aux

    strategy = mesh_strategy(mesh, config)
    if strategy == "fsdp_shard_map":
        from devt_tpu.parallel import fsdp

        n = dict(mesh.shape)[DATA_AXIS]
        cache: dict = {}

        def fsdp_body(state, batch):
            full = fsdp.gather_params(state.params, cache["pspecs"])
            loss, aux = eval_body(state.replace(params=full), batch,
                                  axis_name=DATA_AXIS)
            loss = jax.lax.pmean(loss, DATA_AXIS)

            def rep(x):
                x = jnp.asarray(x)
                if x.ndim == 0:
                    return jax.lax.pmean(x, DATA_AXIS)
                return jax.lax.all_gather(x, DATA_AXIS, axis=0, tiled=True)

            return loss, jax.tree_util.tree_map(rep, aux)

        def run_fsdp(state, batch):
            if "fn" not in cache:
                specs = fsdp.train_state_specs(state, n)
                cache["pspecs"] = specs.params
                cache["fn"] = jax.jit(jax.shard_map(
                    fsdp_body, mesh=mesh, in_specs=(specs, P(DATA_AXIS)),
                    out_specs=(P(), P()), check_vma=False))
            return cache["fn"](state, batch)

        return run_fsdp
    if strategy in ("dp_shard_map", "pp_shard_map", "sp_shard_map"):
        pipe = strategy == "pp_shard_map"
        seq = strategy == "sp_shard_map"

        def body(state, batch):
            loss, aux = eval_body(state, batch, axis_name=DATA_AXIS)
            loss = jax.lax.pmean(loss, DATA_AXIS)
            if pipe:
                from devt_tpu.parallel.pipeline import PIPE_AXIS

                # forward output is psum-replicated across pipe stages —
                # the pmean is a consistency no-op, not a reduction
                loss = jax.lax.pmean(loss, PIPE_AXIS)
                if dict(mesh.shape).get(MODEL_AXIS, 1) > 1:
                    # 3-D mesh: likewise replicated across the TP axis
                    # by the per-block psums
                    loss = jax.lax.pmean(loss, MODEL_AXIS)
            if seq:
                from devt_tpu.parallel.ring_attention import SEQ_AXIS

                # replicated across seq devices by the closing
                # all_gather — consistency no-op
                loss = jax.lax.pmean(loss, SEQ_AXIS)

            def rep(x):
                x = jnp.asarray(x)
                if x.ndim == 0:
                    return jax.lax.pmean(x, DATA_AXIS)
                # per-sample rows: gather shards in axis order, so the
                # result is the global batch in its original order
                return jax.lax.all_gather(x, DATA_AXIS, axis=0, tiled=True)

            return loss, jax.tree_util.tree_map(rep, aux)

        ep_scope = _moe_ep_scope_for(mesh, config)

        def run(state, batch):
            if pipe:
                from devt_tpu.parallel.pipeline import pipeline_scope
                scope = pipeline_scope(mesh)
            elif seq:
                from devt_tpu.parallel.ring_attention import sp_scope
                scope = sp_scope(mesh)
            else:
                scope = ep_scope()
            with scope:
                return jax.shard_map(
                    body, mesh=mesh, in_specs=(P(), P(DATA_AXIS)),
                    out_specs=(P(), P()), check_vma=False)(state, batch)

        return jax.jit(run)

    if strategy == "gspmd":
        tp_scope = _tp_scope_for(mesh, config)

        def traced(state, batch):
            with tp_scope(), pallas_disabled():
                return eval_body(state, batch)
        return jax.jit(traced)
    return jax.jit(eval_body)
