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

``linear_warmup_cosine``: pl_bolts ``LinearWarmupCosineAnnealingLR`` with
``warmup_epochs = epochs // 10`` (contrastivemodel.py:84), stepped per
epoch in Lightning — here expressed per optimizer step via
``steps_per_epoch``.
"""

from __future__ import annotations

import optax

from devt_tpu.config import Config


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
    if opt == "sgd":
        tx = optax.chain(optax.add_decayed_weights(wd),
                         optax.sgd(lr, momentum=config.momentum))
    elif opt == "adamW":
        tx = optax.adamw(lr, weight_decay=wd)
    elif opt == "adagrad":
        tx = optax.chain(optax.add_decayed_weights(wd), optax.adagrad(lr))
    elif opt == "adam":
        tx = optax.chain(optax.add_decayed_weights(wd), optax.adam(lr))
    else:
        raise ValueError(f"unknown optimiser {opt!r}")
    clip = getattr(config, "grad_clip_norm", 0.0)
    if clip and clip > 0.0:
        # global-norm clipping ahead of the update (the Lightning
        # ``gradient_clip_val`` role — the reference never set it, so
        # the default 0.0 keeps parity; production configs can opt in)
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx
