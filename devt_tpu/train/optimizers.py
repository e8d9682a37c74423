"""Optimizers and LR schedules matching the reference's choices.

Dispatch on ``config.opt`` (src/config.yaml:16) mirrors
``configure_optimizers`` across the reference models:
  * ``sgd``     — SGD(momentum, weight_decay) — src/models/transformer.py:58-64,
                  src/models/frame_transformer.py:124-126.  torch's
                  ``weight_decay`` is L2 added to the gradient *before*
                  momentum — reproduced with ``add_decayed_weights`` ahead
                  of the momentum transform.
  * ``adamW``   — decoupled weight decay — frame_transformer.py:127-129.
  * ``adagrad`` — frame_transformer.py:131-133 (L2-style decay).
  * ``adam``    — contrastive/LSTM/MLP models (contrastivemodel.py:63,
                  LSTM.py:46-47, basicmlp.py:38-41; torch Adam
                  weight_decay is L2).
  * ``adafactor`` — TPU-native addition (no reference equivalent):
                  factored second moments + bf16 momentum bound optimizer
                  HBM at ~1/2 params-size vs Adam's 2x params.
``config.moment_dtype="bf16"`` additionally keeps Adam/AdamW first
moments in bfloat16 (second moments stay f32 — see build_optimizer).

``linear_warmup_cosine``: pl_bolts ``LinearWarmupCosineAnnealingLR`` with
``warmup_epochs = epochs // 10`` (contrastivemodel.py:84), stepped per
epoch in Lightning — here expressed per optimizer step via
``steps_per_epoch``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from devt_tpu.config import Config


def _decoupled_decay(wd: float, lr) -> optax.GradientTransformation:
    """AdamW-semantics decoupled weight decay for optimizers whose updates
    are already final deltas (adafactor): adds ``-lr_t * wd * p`` to the
    update.  ``optax.adafactor``'s own ``weight_decay_rate`` applies the
    decay AFTER lr scaling — i.e. ``wd`` per step instead of ``lr*wd``,
    ~1/lr stronger than the adamW branch at this config's lr=5e-6
    (round-4 advisor finding) — so the dispatch passes it ``None`` and
    chains this transform instead, keeping every ``opt=`` choice on the
    same weight-decay magnitude convention."""

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("decoupled weight decay needs params")
        lr_t = lr(state.count) if callable(lr) else lr
        updates = jax.tree_util.tree_map(
            lambda u, p: u - (lr_t * wd * p).astype(u.dtype),
            updates, params)
        return updates, optax.ScaleByScheduleState(
            count=optax.safe_int32_increment(state.count))

    return optax.GradientTransformation(init_fn, update_fn)


def linear_warmup_cosine(base_lr: float, warmup_epochs: int,
                         max_epochs: int, steps_per_epoch: int = 1,
                         eta_min: float = 0.0) -> optax.Schedule:
    warmup = max(warmup_epochs * steps_per_epoch, 1)
    total = max(max_epochs * steps_per_epoch, warmup + 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=base_lr, warmup_steps=warmup,
        decay_steps=total, end_value=eta_min)


def build_optimizer(config: Config, steps_per_epoch: int = 1
                    ) -> optax.GradientTransformation:
    lr = config.learning_rate
    if config.scheduling and config.model == "contrastive":
        lr = linear_warmup_cosine(lr, config.epochs // 10, config.epochs,
                                  steps_per_epoch)

    wd = config.weight_decay
    opt = config.opt
    # TPU-native memory knob (no reference equivalent): bf16 first
    # moments halve the momentum buffer.  nu stays f32 — it accumulates
    # squares, where bf16's 8-bit mantissa biases the adaptive
    # denominator; mu only feeds the update numerator, where rounding is
    # ~unbiased noise (test_optimizers.py pins trajectory agreement).
    mu_dtype = jnp.bfloat16 if config.moment_dtype == "bf16" else None
    if opt == "sgd":
        tx = optax.chain(optax.add_decayed_weights(wd),
                         optax.sgd(lr, momentum=config.momentum))
    elif opt == "adamW":
        tx = optax.adamw(lr, weight_decay=wd, mu_dtype=mu_dtype)
    elif opt == "adagrad":
        tx = optax.chain(optax.add_decayed_weights(wd), optax.adagrad(lr))
    elif opt == "adam":
        tx = optax.chain(optax.add_decayed_weights(wd),
                         optax.adam(lr, mu_dtype=mu_dtype))
    elif opt == "adafactor":
        # Beyond parity, for the reference's widest regime (d=2048, 8
        # layers — src/config.yaml:21-25): factored second moments keep
        # optimizer state ~1/2 params-sized vs Adam's 2x params, the
        # standard production choice when HBM bounds model size.
        # multiply_by_parameter_scale=False + momentum → "Adafactor as
        # a drop-in AdamW": same lr scale conventions as the rest of
        # the dispatch, mu in bf16 by construction (dtype_momentum).
        # Weight decay is chained as _decoupled_decay (adamW magnitude,
        # lr-scaled) — NOT optax's weight_decay_rate, which decays by
        # wd per step regardless of lr (see _decoupled_decay).
        tx = optax.adafactor(
            lr, multiply_by_parameter_scale=False, momentum=0.9,
            dtype_momentum=(jnp.bfloat16 if config.moment_dtype == "bf16"
                            else jnp.float32),
            weight_decay_rate=None)
        if wd > 0.0:
            tx = optax.chain(tx, _decoupled_decay(wd, lr))
    else:
        raise ValueError(f"unknown optimiser {opt!r}")
    clip = getattr(config, "grad_clip_norm", 0.0)
    if clip and clip > 0.0:
        # global-norm clipping ahead of the update (the Lightning
        # ``gradient_clip_val`` role — the reference never set it, so
        # the default 0.0 keeps parity; production configs can opt in)
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx
