"""Training/eval harness — the ``pl.Trainer`` of this framework.

Replaces the reference's runtime (``pl.Trainer(gpus=1, logger, callbacks,
max_epochs)``, src/main.py:87-88) with an explicit loop around a single
jitted train step:

  * host input pipeline yields fixed-shape numpy batches (devt_tpu/data);
  * batches are device_put with the data-parallel sharding while the
    previous step computes (simple software pipelining);
  * validation at epoch cadence fills RunningBuffers and fires the
    epoch-end callbacks (threshold-swept F1 / mAP / report — the
    reference's callback stack);
  * async Orbax checkpoint each ``eval_every_epochs`` epochs and at the
    end (the write streams while the next epoch trains);
  * per-step JSONL/wandb logging.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import numpy as np

from devt_tpu.config import Config
from devt_tpu.data.pipeline import device_prefetch
from devt_tpu.parallel.mesh import make_mesh, shard_batch
from devt_tpu.parallel.train_step import (make_eval_step, make_multi_step,
                                          make_train_step)
from devt_tpu.train import checkpoint as ckpt_lib
from devt_tpu.train.callbacks import Callback
from devt_tpu.train.loggers import JsonlLogger
from devt_tpu.train.metrics import RunningBuffers
from devt_tpu.train.optimizers import build_optimizer
from devt_tpu.train.profiling import StepTimer
from devt_tpu.train.state import TrainState


def _stacked(iterator, k: int):
    """Group k device batches into one leading-axis-stacked tree (drops a
    trailing partial group — same drop_last semantics as the loader)."""
    import jax.numpy as jnp

    group = []
    for item in iterator:
        group.append(item)
        if len(group) == k:
            yield jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *group)
            group = []


class Trainer:
    def __init__(self, config: Config, callbacks: Sequence[Callback] = (),
                 logger=None, mesh=None, use_mesh: bool = False):
        self.config = config
        self.callbacks = list(callbacks)
        self.logger = logger or JsonlLogger(name=config.name)
        self.mesh = mesh or (make_mesh(config.dp, config.mp, config.pp,
                                       getattr(config, "sp", 1))
                             if use_mesh else None)
        self.buffers = RunningBuffers()
        self._rng = jax.random.PRNGKey(config.seed)

    # ------------------------------------------------------------------
    def _init_state(self, model, example, steps_per_epoch: int) -> TrainState:
        rngs = {"params": jax.random.PRNGKey(self.config.seed),
                "dropout": jax.random.PRNGKey(self.config.seed + 1)}
        kwargs = self._apply_kwargs(example)
        variables = model.init(rngs, **kwargs)
        variables = dict(variables)
        params = variables.pop("params")
        # sown MoE aux losses are transient per-step values, not state
        variables.pop("losses", None)
        tx = build_optimizer(self.config, steps_per_epoch)
        state = TrainState.create(params, tx, model_state=variables)
        if self.mesh is not None:
            if self.config.dp_mode in ("fsdp", "fsdp_gspmd"):
                # ZeRO-3: the whole TrainState (params, Adam moments,
                # mutable collections) lives sharded over the data axis
                from devt_tpu.parallel.fsdp import shard_train_state
                state = shard_train_state(state, self.mesh)
            else:
                # whole-state placement: params by the Megatron TP rules
                # AND the Adam moments on the same shards as their param —
                # moments left replicated would make the SPMD partitioner
                # re-materialize them every step (parallel/sharding.py)
                from devt_tpu.parallel import sharding
                state = sharding.shard_train_state(state, self.mesh)
        if self.config.resume:
            state = ckpt_lib.restore(self.config.resume, state)
        return state

    def _apply_kwargs(self, batch) -> dict[str, Any]:
        """Map batch keys to the model's __call__ signature."""
        name = self.config.model
        from devt_tpu.models.frame_transformer import VARIANTS as FT
        if name in FT:
            return {"img": batch.get("img"), "vid": batch.get("vid")}
        if name == "vivit":
            if "vid_tokens" in batch:
                return {"x": batch["vid_tokens"], "tokens_in": True}
            return {"x": batch["vid"]}
        if name == "tpn":
            return {"x": batch["img"]}
        if name == "contrastive":
            return {"x": batch["x_i"]}
        if name in ("ptn", "ptn_shared"):
            return {"experts": batch["experts"]}
        return {"x": batch["experts"]}

    @staticmethod
    def _split_host_only(batch):
        """Non-numeric entries (e.g. paths) stay on the host."""
        device = {k: v for k, v in batch.items()
                  if isinstance(v, np.ndarray) and v.dtype.kind in "biuf"}
        host = {k: v for k, v in batch.items() if k not in device}
        return device, host

    def _place(self, batch):
        device, _ = self._split_host_only(batch)
        if self.mesh is not None:
            return shard_batch(device, self.mesh)
        return jax.tree_util.tree_map(jax.numpy.asarray, device)

    # ------------------------------------------------------------------
    def fit(self, model, datamodule) -> TrainState:
        cfg = self.config
        datamodule.setup()
        # steps_per_epoch must count what the loop ACTUALLY executes: the
        # per-host Loader yields (len(ds)//process_count)//batch_size
        # batches, so on multi-host runs datamodule.train_steps (whole-
        # dataset count) would mis-map the resume (epoch, skip) inversion
        # and overstate the lr schedule (round-4 advisor finding) —
        # prefer len(loader) whenever the loader is sized
        steps_per_epoch = max(getattr(datamodule, "train_steps", 1), 1)
        _loader0 = datamodule.train_batches()
        try:
            steps_per_epoch = max(len(_loader0), 1)
        except TypeError:
            pass    # unsized iterable (synthetic generators): keep
                    # the datamodule's declared count
        example = next(iter(_loader0))
        state = self._init_state(model, example, steps_per_epoch)
        self._saver = ckpt_lib.AsyncSaver()

        train_step = make_train_step(model, cfg, mesh=self.mesh)
        eval_step = make_eval_step(model, cfg, mesh=self.mesh)
        needs_train_aux = any(getattr(cb, "on_train_batch_end", None)
                              and type(cb).on_train_batch_end
                              is not Callback.on_train_batch_end
                              for cb in self.callbacks)
        unroll = max(cfg.unroll_steps, 1)
        multi_step = (make_multi_step(model, cfg, unroll, mesh=self.mesh)
                      if unroll > 1 and not needs_train_aux else None)

        global_step = int(state.step)
        # step-exact resume: a restored step count maps back to (epoch,
        # batch-within-epoch), so the data stream continues exactly where
        # the checkpointed run stopped instead of replaying from the top
        # (Lightning restores the loop position the same way; here the
        # mapping is exact because rng folds on state.step and every
        # epoch's permutation is a pure function of (seed, epoch)).
        # With multi-step unrolling, _stacked drops the trailing partial
        # group, so an epoch advances global_step by unroll*(spe//unroll)
        # — the inversion must use THAT count or a resume lands mid-epoch
        # off by the dropped tail (round-4 advisor finding)
        epoch_steps = (unroll * (steps_per_epoch // unroll)
                       if multi_step is not None else steps_per_epoch)
        epoch_steps = max(epoch_steps, 1)
        start_epoch = global_step // epoch_steps if global_step else 0
        resume_skip = global_step % epoch_steps if global_step else 0
        timer = StepTimer()
        profiling_on = False
        run_steps = 0      # TRAIN steps executed in THIS run (multi-step
                           # launches count as ``unroll``) — the profiler
                           # window must not shift (or capture the fresh
                           # compile) when resuming from a checkpoint
        try:
            for epoch in range(start_epoch, cfg.epochs):
                loader = datamodule.train_batches()
                if hasattr(loader, "set_epoch"):
                    # reshuffle-per-epoch (the torch DataLoader
                    # shuffle=True contract) + mid-epoch resume skip
                    loader.set_epoch(
                        epoch, resume_skip if epoch == start_epoch else 0)
                # device-side double buffering: batches are device_put
                # ``host_batch_prefetch`` steps ahead of consumption, so
                # the H2D copy of step N+1 overlaps step N's compute
                placed_iter = device_prefetch(
                    loader, placer=self._place,
                    depth=max(cfg.host_batch_prefetch, 1))
                if multi_step is not None:
                    placed_iter = _stacked(placed_iter, unroll)
                for placed in placed_iter:
                    # trace the steady state: start once ≥2 train steps
                    # ran (past compile/warmup), stop once ≥8 have — short
                    # enough to stay TensorBoard-loadable
                    if cfg.profile_dir and not profiling_on \
                            and run_steps >= 2:
                        import jax.profiler as _prof
                        _prof.start_trace(cfg.profile_dir)
                        profiling_on = True
                    if multi_step is not None:
                        state, metrics = multi_step(state, placed, self._rng)
                        global_step += unroll
                        run_steps += unroll
                    else:
                        state, metrics = train_step(state, placed, self._rng)
                        global_step += 1
                        run_steps += 1
                    if profiling_on and run_steps >= 8:
                        import jax.profiler as _prof
                        float(metrics["loss"])      # sync before stopping
                        _prof.stop_trace()
                        profiling_on = False
                    if needs_train_aux:
                        _, aux = eval_step(state, placed)
                        for cb in self.callbacks:
                            cb.on_train_batch_end(aux, self.logger,
                                                  global_step)
                    log_hit = (global_step % cfg.log_every < unroll) \
                        if multi_step else global_step % cfg.log_every == 0
                    if log_hit:
                        # the loss readback is the async-safe sync point
                        timer.mark_step(metrics["loss"])
                        loss_val = float(metrics["loss"])
                        if not np.isfinite(loss_val):
                            # failure detection: a non-finite loss is
                            # unrecoverable in-flight — surface it
                            # immediately with the step for
                            # checkpoint-based recovery
                            self.logger.log({"train/loss": loss_val,
                                             "fatal": "non-finite loss"},
                                            global_step)
                            raise FloatingPointError(
                                f"non-finite loss {loss_val} at step "
                                f"{global_step}; last checkpoint in "
                                f"{cfg.checkpoint_dir!r}")
                        rec = {"train/loss": loss_val, "epoch": epoch}
                        rec.update(timer.summary(
                            items_per_step=cfg.batch_size * cfg.log_every))
                        self.logger.log(rec, global_step)
                    else:
                        timer.mark_step()
                    if 0 < cfg.max_steps <= global_step:
                        break

                if (epoch + 1) % cfg.eval_every_epochs == 0:
                    results = self.validate(model, datamodule, state,
                                            eval_step, global_step)
                    self._maybe_save_best(results, state, global_step)
                    # async: the write streams while the next epoch trains
                    self._saver.save(cfg.checkpoint_dir, state, cfg)
                if 0 < cfg.max_steps <= global_step:
                    break

            self._saver.save(cfg.checkpoint_dir, state, cfg)
        finally:
            # always await in-flight async writes, even on the
            # non-finite-loss abort path (ADVICE r2)
            if profiling_on:
                import jax.profiler as _prof
                _prof.stop_trace()
            self._saver.close()
        return state

    # ------------------------------------------------------------------
    def _maybe_save_best(self, results: dict, state, step: int) -> None:
        """Best-metric checkpointing: when ``config.best_metric`` improves,
        save to ``<checkpoint_dir>/best`` and keep the newest
        ``keep_best_k`` — the reference's commented ModelCheckpoint /
        best-acc intent (src/main.py:57-58, callbacks.py:100-102)
        implemented properly."""
        cfg = self.config
        key = cfg.best_metric
        if not key or key not in results:
            return
        value = float(results[key])
        best = getattr(self, "_best_value", None)
        improved = best is None or (
            value > best if cfg.best_mode == "max" else value < best)
        if not improved:
            return
        self._best_value = value
        best_dir = os.path.join(cfg.checkpoint_dir, "best")
        self._saver.save(best_dir, state, cfg, step=step)
        # best saves are rare (metric must improve): await the write so
        # the retention pass sees the finalized directory
        self._saver.wait()
        ckpt_lib.prune_checkpoints(best_dir, max(cfg.keep_best_k, 1))
        self.logger.log({f"best/{key}": value}, step)

    # ------------------------------------------------------------------
    def validate(self, model, datamodule, state, eval_step=None,
                 step: int = 0) -> dict:
        eval_step = eval_step or make_eval_step(model, self.config)
        losses = []
        ssl_cbs = [cb for cb in self.callbacks
                   if hasattr(cb, "eval_batch")]
        for batch in datamodule.val_batches():
            loss, aux = eval_step(state, self._place(batch))
            losses.append(float(loss))
            _, host = self._split_host_only(batch)
            if ssl_cbs:
                for cb in ssl_cbs:
                    cb.eval_batch(aux, self.buffers)
            else:
                self.buffers.append({**aux, "path": host.get("path")})
        results = {"val/loss": float(np.mean(losses)) if losses else 0.0}
        self.logger.log(results, step)
        for cb in self.callbacks:
            out = cb.on_validation_epoch_end(self.buffers, self.logger, step)
            if isinstance(out, dict):
                results.update(out)
        return results

    # ------------------------------------------------------------------
    def test(self, model, datamodule, state=None, ckpt_path: str = "") -> dict:
        cfg = self.config
        datamodule.setup()
        if state is None:
            example = next(iter(datamodule.test_batches()))
            state = self._init_state(model, example, 1)
            path = ckpt_path or ckpt_lib.latest_checkpoint(cfg.checkpoint_dir)
            if path:
                state = ckpt_lib.restore(path, state)
        eval_step = make_eval_step(model, cfg)
        losses = []
        for batch in datamodule.test_batches():
            loss, aux = eval_step(state, self._place(batch))
            losses.append(float(loss))
            _, host = self._split_host_only(batch)
            self.buffers.append({**aux, "path": host.get("path")})
        results = {"test/loss": float(np.mean(losses)) if losses else 0.0}
        for cb in self.callbacks:
            out = cb.on_test_epoch_end(self.buffers, self.logger,
                                       int(state.step))
            if isinstance(out, dict):
                results.update(out)
        self.logger.log({"test/loss": results["test/loss"]}, int(state.step))
        return results
