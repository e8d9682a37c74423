"""Batch inference / serving.

The reference's deployment story is ``trainer.test`` from a checkpoint
(src/main.py:89-111).  For production serving this module wraps a trained
model in a :class:`Predictor`:

  * one jit-compiled forward per (padded) batch shape — requests are
    padded up to the nearest compiled bucket so arbitrary batch sizes
    never trigger recompiles;
  * checkpoint loading via Orbax (devt_tpu checkpoints) or the Lightning
    importer (reference ``.ckpt`` files);
  * outputs are post-sigmoid/softmax scores plus thresholded genre labels
    — the callback semantics (threshold 0.3, callbacks.py:59) as an API.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from devt_tpu.config import MMX_GENRES_15, MMX_GENRES_19, Config
from devt_tpu.registry import build_model


# param trees above this close-over-constants budget serve quantized
# weights as jit ARGUMENTS instead of HLO literals (Predictor.__init__)
FOLD_MODE_MAX_BYTES = 64 << 20


def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad)


class Predictor:
    """Jit-compiled inference over bucketed batch sizes."""

    def __init__(self, config: Config, variables: Mapping[str, Any],
                 buckets: Sequence[int] = (1, 8, 32),
                 threshold: float = 0.3, mesh=None,
                 quantize: bool = False, quant_site_pred=None):
        """``quantize=True`` serves the transformer hot path int8
        (ops/quant.py): weights per-channel, activations dynamic
        per-token, contractions on the MXU's int8 path through the fused
        Pallas kernels.  Weight delivery picks one of two modes by model
        size: ≤64 MB trees close over the trace as constants (XLA folds
        the rounding; weights frozen at construction), bigger trees are
        pre-quantized once at init and enter the serving jit as int8
        ARGUMENTS (no multi-hundred-MB HLO literals — the production
        shape for wide models like PTN).

        ``quant_site_pred``: optional ``(k, n) -> bool`` Dense-site
        filter (ops/attention.quant_scope).  None applies the measured
        default policy ``n >= 2k`` — quantize a Dense site only when its
        output is at least twice its input width.  The r5 per-site chip
        ablation (bench_int8_serving_ptn) found the square 2048->2048
        sites are int8 LOSERS (0.89x bf16 whole-model: the O(m*k) row
        quantize doesn't amortize against enough MXU columns) while the
        2048->6144 qkv projection wins (1.12x — at the family's Amdahl
        ceiling, dense-site time fraction ~0.19).  Pass an explicit
        predicate (e.g. ``lambda k, n: True``) to override."""
        if quantize and quant_site_pred is None:
            quant_site_pred = lambda k, n: n >= 2 * k
        self.config = config
        self.model = build_model(config)
        self.variables = dict(variables)
        self.threshold = threshold
        self.mesh = mesh
        self.quantize = quantize
        if mesh is not None:
            # data-parallel serving: requests shard over the mesh's data
            # axis (weights replicated), so one Predictor saturates every
            # chip of a slice — each bucket must divide evenly
            from devt_tpu.parallel.mesh import DATA_AXIS
            n = mesh.shape[DATA_AXIS]
            self.buckets = sorted({-(-b // n) * n for b in buckets})
        else:
            self.buckets = sorted(buckets)
        self.target_names = (MMX_GENRES_19 if config.n_classes == 19
                             else MMX_GENRES_15)

        model = self.model
        name = config.model

        def forward(variables, batch):
            # uint8 wire format: img/vid arrive as raw u8 pixels (the
            # native decoder's output) and normalize on device — same
            # contract as the train step (data/device_norm.py)
            from devt_tpu.data.device_norm import maybe_dequantize_batch
            batch = maybe_dequantize_batch(batch, dtype=jnp.float32)
            if name in ("ptn", "ptn_shared"):
                out = model.apply(variables, batch["experts"])
            elif name == "vivit":
                # accepts either raw clips ("vid") or the native loader's
                # pre-patchified token wire ("vid_tokens", u8 or float)
                if "vid_tokens" in batch:
                    out = model.apply(variables, batch["vid_tokens"],
                                      tokens_in=True)
                else:
                    out = model.apply(variables, batch["vid"])
            elif name == "tpn":
                return model.apply(variables, batch["img"])  # already probs
            elif name == "lstm":
                out = model.apply(variables, batch["experts"])
            elif name == "basicmlp":
                out = model.apply(variables, batch["experts"])
                return jax.nn.softmax(out, axis=-1)
            else:
                out = model.apply(variables, img=batch.get("img"),
                                  vid=batch.get("vid"))["logits"]
            return jax.nn.sigmoid(out)

        self._qsites = None
        if quantize:
            import numpy as _np

            from devt_tpu.ops.attention import quant_scope
            from devt_tpu.ops.quant import (quant_sites_collect,
                                            quant_sites_provide)

            base, frozen = forward, self.variables
            nbytes = sum(_np.asarray(x).nbytes for x in
                         jax.tree_util.tree_leaves(frozen))
            if nbytes <= FOLD_MODE_MAX_BYTES:
                # fold mode (small models): params close over the trace
                # as constants, so the weight-side rounding folds into
                # int8 constants in the compiled program.  NOTE: this
                # FREEZES the weights at construction — later writes to
                # ``pred.variables`` (checkpoint hot-swap) do not reach
                # the Predictor; rebuild it instead.
                def forward(_, batch):  # noqa: F811 — quantized wrapper
                    with quant_scope(quant_site_pred):
                        return base(frozen, batch)
            else:
                # arg mode (big models): baking hundreds of MB of f32
                # literals into the HLO is not shippable — weights are
                # quantized ONCE here (eager collect pass over a
                # one-sample batch; call order is the site identity) and
                # the serving jit takes the int8 site list as ARGUMENTS
                # (ops/quant.py site registry).
                from devt_tpu.registry import example_batch
                tiny = {k: jnp.asarray(v)
                        for k, v in example_batch(config,
                                                  batch_size=1).items()
                        if k != "label"}
                sites: list = []
                with quant_scope(quant_site_pred), \
                        quant_sites_collect(sites):
                    base(frozen, tiny)
                self._qsites = sites

                def forward(variables, batch, qsites):  # noqa: F811
                    with quant_scope(quant_site_pred), \
                            quant_sites_provide(qsites):
                        return base(variables, batch)

        if mesh is not None and mesh.size > 1:
            from jax.sharding import PartitionSpec as P

            from devt_tpu.parallel.mesh import DATA_AXIS

            # shard_map, not GSPMD in_shardings: per-device shapes are
            # concrete inside the body, so the fused Pallas kernels stay
            # hot on every chip (same shape as the DP train step,
            # parallel/train_step._shard_map_dp) — a pallas_call under
            # sharded-operand GSPMD would be opaque and unpartitionable
            body = forward
            in_specs = (P(), P(DATA_AXIS)) if self._qsites is None \
                else (P(), P(DATA_AXIS), P())
            self._forward = jax.jit(jax.shard_map(
                body, mesh=mesh,
                in_specs=in_specs, out_specs=P(DATA_AXIS)))
        else:
            self._forward = jax.jit(forward)

    def _invoke(self, chunk):
        """One compiled forward on an already-padded batch dict."""
        if self._qsites is not None:
            return self._forward(self.variables, chunk, self._qsites)
        if self.quantize:
            # fold mode closed over its (frozen) weights at trace time —
            # don't ship the unused f32 tree per call
            return self._forward((), chunk)
        return self._forward(self.variables, chunk)

    @classmethod
    def from_checkpoint(cls, config: Config, ckpt_path: str,
                        **kw) -> "Predictor":
        from devt_tpu.registry import example_batch
        from devt_tpu.train import checkpoint as ckpt_lib
        from devt_tpu.train.optimizers import build_optimizer
        from devt_tpu.train.state import TrainState

        model = build_model(config)
        batch = {k: jnp.asarray(v)
                 for k, v in example_batch(config, batch_size=1).items()
                 if k != "label"}
        # init a state with the right tree to restore into
        rngs = {"params": jax.random.PRNGKey(0)}
        from devt_tpu.train.harness import Trainer

        trainer_kwargs = Trainer(config)._apply_kwargs(batch)
        variables = dict(model.init(rngs, **trainer_kwargs))
        params = variables.pop("params")
        state = TrainState.create(params, build_optimizer(config),
                                  model_state=variables)
        state = ckpt_lib.restore(ckpt_path, state)
        return cls(config, {"params": state.params, **state.model_state},
                   **kw)

    @classmethod
    def from_lightning_checkpoint(cls, config: Config, ckpt_path: str,
                                  **kw) -> "Predictor":
        from devt_tpu.utils import lightning_import

        sd = lightning_import.load_checkpoint_state_dict(ckpt_path)
        if config.model in ("ptn", "ptn_shared"):
            variables = lightning_import.simple_transformer(
                sd, nlayers=config.nlayers,
                num_experts=len(config.experts))
        else:
            variables = lightning_import.frame_transformer(sd)
        return cls(config, variables, **kw)

    # ------------------------------------------------------------------
    def export(self, path: str, batch_size: int | None = None,
               platforms: Sequence[str] | None = None) -> None:
        """AOT-export the forward as a serialized StableHLO artifact.

        The reference has no deployment-artifact story (its serving is
        ``trainer.test`` inside the training venv); this is the TPU-native
        one: ``jax.export`` lowers the jitted forward — parameters baked
        in as constants — to a single self-contained blob that
        :func:`load_exported` (or any StableHLO runtime) executes WITHOUT
        the model code, flax, or the checkpoint tree.

        ``platforms`` (e.g. ``("tpu", "cpu")``) requests cross-platform
        lowering; the default is the current backend.  Portable artifacts
        should be exported from ``attention_impl="xla"`` configs — a
        ``pallas_call`` lowers for the platform it was traced on only.
        ``batch_size`` defaults to the largest serving bucket; callers pad
        requests to it exactly like :meth:`predict` does.
        """
        from jax import export as jexport

        from devt_tpu.registry import example_batch

        b = batch_size or self.buckets[-1]
        example = {k: jnp.asarray(v)
                   for k, v in example_batch(self.config,
                                             batch_size=b).items()
                   if k != "label"}
        variables = self.variables
        fwd = self._forward
        if self._qsites is not None:
            # arg-mode quantized predictor: the artifact bakes the int8
            # site list in alongside the variables (an export is an
            # artifact-with-weights by definition)
            qsites = self._qsites
            exported = jexport.export(
                jax.jit(lambda batch: fwd(variables, batch, qsites)),
                platforms=platforms)(example)
        else:
            exported = jexport.export(
                jax.jit(lambda batch: fwd(variables, batch)),
                platforms=platforms)(example)
        with open(path, "wb") as f:
            f.write(exported.serialize())

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def predict(self, batch: Mapping[str, np.ndarray]) -> dict[str, Any]:
        """batch: model-keyed arrays with leading batch dim (any size).
        Returns {"scores": (N, C), "labels": [[genre, ...], ...]}."""
        n = next(iter(batch.values())).shape[0]
        scores = []
        start = 0
        while start < n:
            take = min(self._bucket(n - start), n - start)
            bucket = self._bucket(take)
            chunk = {k: _pad_to(np.asarray(v[start:start + take]), bucket)
                     for k, v in batch.items()}
            out = np.asarray(self._invoke(chunk))[:take]
            scores.append(out)
            start += take
        scores = np.concatenate(scores) if scores else np.zeros((0, 0))
        labels = [[self.target_names[i] for i, s in enumerate(row)
                   if s > self.threshold and i < len(self.target_names)]
                  for row in scores]
        return {"scores": scores, "labels": labels}


def load_exported(path: str):
    """Load an artifact written by :meth:`Predictor.export`.

    Returns a callable taking the model-keyed batch dict (already padded
    to the exported batch size) and returning the score array — no model
    code or checkpoint needed.
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    return exported.call
