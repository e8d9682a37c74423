"""Per-model forward + loss — the step logic of the Lightning modules.

The reference spreads ``training_step``/``validation_step`` across each
LightningModule (src/models/transformer.py:135-160,
frame_transformer.py:246-345, contrastivemodel.py:143-199, LSTM.py:49-79,
basicmlp.py:63-106).  Here one pure function dispatches on the model name
and returns ``(loss, aux, mutated_model_state)`` — jitted by the train-step
factory in devt_tpu/parallel/train_step.py.

``aux`` always carries ``probs`` (post-sigmoid/softmax scores) and
``label`` so epoch-end evaluators can accumulate the reference's
``running_logits``/``running_labels`` buffers
(src/models/transformer.py:154-158).

A note on NT-Xent world-size awareness: the contrastive loss is written
over the *global* batch; under pjit with the batch sharded over the data
axis, GSPMD inserts the cross-replica all-gather for the similarity matrix
automatically — the DDP semantics the reference's ``NT_Xent(world_size)``
mask prepares for (src/models/losses/ntxent.py:6-25) with zero extra code.
An explicit ``shard_map`` variant lives in devt_tpu.models.losses.nt_xent.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from devt_tpu.config import Config
from devt_tpu.models import losses
from devt_tpu.models.contrastive import l2_normalize
from devt_tpu.models.frame_transformer import VARIANTS as FT_VARIANTS


def forward_and_loss(model, config: Config, variables, batch, rng,
                     train: bool, axis_name: str | None = None):
    """Returns (loss, aux, new_model_state).

    ``axis_name`` is set when the body runs inside ``shard_map`` over the
    data mesh axis (parallel/train_step.py DP path): per-sample losses
    need nothing (the step pmeans them), but the contrastive loss must
    score against the *global* negatives pool, so its projections are
    all-gathered across replicas — the reference's NT_Xent ``world_size``
    semantics (src/models/losses/ntxent.py:6-25).
    """
    from devt_tpu.data.device_norm import maybe_dequantize_batch

    name = config.model
    # u8 wire format: pixel batches arrive as uint8 and are normalized
    # here, inside the jitted step (data/device_norm.py)
    dtype = jnp.bfloat16 if config.precision == "bf16" else jnp.float32
    batch = maybe_dequantize_batch(batch, dtype=dtype)
    rngs = {"dropout": rng} if train else None
    has_bn = any(k != "params" for k in variables)
    mutable = [k for k in variables if k != "params"] if (train and has_bn) \
        else False
    if train and getattr(model, "moe_experts", 0):
        # switch-MoE blocks sow their router load-balance loss into the
        # "losses" collection (models/layers.py MoEViTBlock); collect it
        # mutably so it reaches the objective below
        mutable = (mutable or []) + ["losses"]

    def apply(*args, _variables=None, _rng=None, **kwargs):
        vs = variables if _variables is None else _variables
        r = {"dropout": _rng} if _rng is not None else rngs
        out = model.apply(vs, *args, rngs=r, mutable=mutable, **kwargs)
        if mutable:
            y, mut = out
            return y, dict(mut)
        return out, {k: v for k, v in vs.items() if k != "params"}

    label = batch["label"]

    if name in ("ptn", "ptn_shared"):
        logits, mut = apply(batch["experts"], deterministic=not train)
        if label.ndim == 1:    # MIT single-label → CE + top-1 semantics
            loss = losses.cross_entropy(logits, label)
            probs = jax.nn.softmax(logits, axis=-1)
        else:                  # MMX multi-hot → BCE (transformer.py:35)
            loss = losses.bce_with_logits(logits, label)
            probs = jax.nn.sigmoid(logits)
        return loss, {"probs": probs, "label": label}, mut

    if name == "lstm":
        logits, mut = apply(batch["experts"], train=train)
        probs = jax.nn.sigmoid(logits)
        # reference applies sigmoid then BCELoss (src/models/LSTM.py:55-57)
        loss = losses.bce(probs, label)
        return loss, {"probs": probs, "label": label}, mut

    if name in FT_VARIANTS:
        out, mut = apply(img=batch.get("img"), vid=batch.get("vid"),
                         train=train)
        loss = losses.bce_with_logits(out["logits"], label)
        aux = {"probs": jax.nn.sigmoid(out["logits"]), "label": label,
               "embedding": out.get("embedding")}
        if name == "distil":
            dloss = losses.distillation_loss(out["distil_logits"],
                                             out["teacher_logits"])
            aux["base_loss"] = loss
            aux["distil_loss"] = dloss
            # cosine similarity of student/teacher logits, logged by the
            # reference (frame_transformer.py:257-258)
            s = l2_normalize(out["logits"])
            t = l2_normalize(out["teacher_logits"])
            aux["cossim"] = jnp.mean(jnp.sum(s * t, axis=-1))
            loss = loss + dloss
        return loss, aux, mut

    if name == "vivit":
        # "vid_tokens": pre-patchified (B, T, N, p*p*c) clips — the
        # layout the native loader emits at decode time (models/vivit.py
        # patchify); skips the conv patch embed for one clean matmul.
        if "vid_tokens" in batch:
            logits, mut = apply(batch["vid_tokens"],
                                deterministic=not train, tokens_in=True)
        else:
            logits, mut = apply(batch["vid"], deterministic=not train)
        if label.ndim == 1:    # single-label (MIT-style)
            loss = losses.cross_entropy(logits, label)
            probs = jax.nn.softmax(logits, axis=-1)
        else:                  # multi-hot genres (MMX-style)
            loss = losses.bce_with_logits(logits, label)
            probs = jax.nn.sigmoid(logits)
        aux = {"probs": probs, "label": label}
        if isinstance(mut, dict) and "losses" in mut:
            # mean of the sown per-MoE-layer load-balance losses, weighted
            # into the objective; "losses" is transient — it must not
            # land in the TrainState/checkpoints as model state
            sown = jax.tree_util.tree_leaves(mut.pop("losses"))
            moe_aux = sum(sown) / len(sown)
            loss = loss + config.moe_aux_weight * moe_aux
            aux["moe_aux"] = moe_aux
        return loss, aux, mut

    if name == "tpn":
        probs, mut = apply(batch["img"], train=train)
        # TPN emits sigmoid-averaged probabilities (TPN.py:98,112)
        loss = losses.bce(probs, label)
        return loss, {"probs": probs, "label": label}, mut

    if name == "contrastive":
        # distinct dropout masks per augmented view, and view j's forward
        # sees (and returns) the BatchNorm stats mutated by view i — the
        # sequential-two-pass semantics of the reference's training_step
        # (src/models/contrastivemodel.py:143-164).
        rng_i, rng_j = (jax.random.split(rng) if train else (None, None))
        (emb_i, proj_i), mut = apply(batch["x_i"], train=train, _rng=rng_i)
        (emb_j, proj_j), mut = apply(batch["x_j"], train=train, _rng=rng_j,
                                     _variables={**variables, **mut})
        z_i = l2_normalize(proj_i)
        z_j = l2_normalize(proj_j)
        if axis_name is not None:
            # all-gather over ICI: every replica scores its positives
            # against the global pool; with the DP step's grad pmean the
            # parameter gradient equals the single-device global-batch
            # gradient exactly (all_gather's transpose psum-scatters the
            # per-replica cotangents back to the owning shard).
            z_i = jax.lax.all_gather(z_i, axis_name, axis=0, tiled=True)
            z_j = jax.lax.all_gather(z_j, axis_name, axis=0, tiled=True)
        loss = losses.contrastive_loss(z_i, z_j,
                                       temperature=config.temperature)
        return loss, {"embedding": emb_i, "label": label,
                      "probs": jnp.zeros((label.shape[0], 1))}, mut

    if name == "basicmlp":
        logits, mut = apply(batch["experts"], train=train)
        loss = losses.cross_entropy(logits, label)
        return loss, {"probs": jax.nn.softmax(logits, axis=-1),
                      "label": label}, mut

    raise ValueError(f"no step logic for model {name!r}")
