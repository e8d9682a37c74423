"""Loss functions for the model family.

Covers the reference's losses:
  * BCE-with-logits for multi-label genre tagging
    (src/models/transformer.py:35, src/models/frame_transformer.py:89)
  * cross-entropy for distillation targets and MIT single-label
    (src/models/frame_transformer.py:90, src/models/basicmlp.py:22-29)
  * NT-Xent — the *world-size aware* SimCLR loss
    (src/models/losses/ntxent.py:5-41).  The reference sizes its mask for
    cross-replica batches but contains no all-gather (Lightning DDP would
    have provided it — SURVEY.md §2.8); here the gather is explicit:
    pass ``axis_name`` inside ``shard_map``/``pjit`` and negatives come
    from every data-parallel replica over ICI.
    NOTE the reference function is missing its ``return loss``
    (ntxent.py:41) — the evident intent (returning the normalised CE) is
    implemented and regression-tested.
  * ContrastiveLoss — single-process SimCLR variant
    (src/models/losses/ntxent.py:44-75).

All losses compute in f32 regardless of input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits, targets) -> jnp.ndarray:
    """Mean binary cross-entropy on logits (= torch BCEWithLogitsLoss)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # log(1+exp(-|x|)) formulation, numerically stable.
    neg_abs = -jnp.abs(logits)
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(neg_abs))
    return jnp.mean(loss)


def bce(probs, targets, eps: float = 1e-7) -> jnp.ndarray:
    """Mean BCE on probabilities (= torch BCELoss; the LSTM baseline applies
    sigmoid before the loss — src/models/LSTM.py:56-57)."""
    p = jnp.clip(probs.astype(jnp.float32), eps, 1.0 - eps)
    t = targets.astype(jnp.float32)
    return jnp.mean(-(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p)))


def cross_entropy(logits, labels) -> jnp.ndarray:
    """Mean CE with integer labels (= torch CrossEntropyLoss)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def distillation_loss(student_logits, teacher_logits) -> jnp.ndarray:
    """CE of the student's distil-token logits against the argmax of the
    teacher's logits (src/models/frame_transformer.py:250: the teacher
    target is hard — ``torch.argmax(vid, dim=-1)``)."""
    labels = jnp.argmax(jax.lax.stop_gradient(teacher_logits), axis=-1)
    return cross_entropy(student_logits, labels)


def _cosine_sim_matrix(z) -> jnp.ndarray:
    """Pairwise cosine similarity of rows (2N, D) → (2N, 2N), f32."""
    z = z.astype(jnp.float32)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)
    return z @ z.T


def nt_xent(z_i, z_j, temperature: float = 0.5,
            axis_name: str | None = None) -> jnp.ndarray:
    """World-size-aware NT-Xent (src/models/losses/ntxent.py:5-41 intent).

    With ``axis_name`` set (inside shard_map over the data mesh axis),
    projections are all-gathered across replicas so every replica scores
    its positives against the *global* negative pool — the semantics the
    reference's ``world_size`` mask prepares for.
    """
    if axis_name is not None:
        # tiled=True concatenates along the batch axis: (world*B, D).
        z_i = jax.lax.all_gather(z_i, axis_name, axis=0, tiled=True)
        z_j = jax.lax.all_gather(z_j, axis_name, axis=0, tiled=True)

    n = z_i.shape[0]            # batch * world_size
    big_n = 2 * n
    z = jnp.concatenate([z_i, z_j], axis=0)
    sim = _cosine_sim_matrix(z) / temperature

    # positives: diag at offsets ±n (ntxent.py:32-35)
    pos = jnp.concatenate([jnp.diagonal(sim, n), jnp.diagonal(sim, -n)])
    # mask: drop self-similarity and the positive pairs (ntxent.py:15-22)
    eye = jnp.eye(big_n, dtype=bool)
    pos_mask = jnp.roll(eye, n, axis=1) | jnp.roll(eye, -n, axis=1)
    neg_inf = jnp.float32(-1e9)
    neg = jnp.where(eye | pos_mask, neg_inf, sim)

    # CE with the positive as class 0 against all negatives
    # (ntxent.py:38-41), sum reduction normalised by 2N.
    logits = jnp.concatenate([pos[:, None], neg], axis=1)
    loss = -jax.nn.log_softmax(logits, axis=1)[:, 0]
    return jnp.sum(loss) / big_n


def contrastive_loss(z_i, z_j, temperature: float = 0.5) -> jnp.ndarray:
    """Single-process SimCLR loss (src/models/losses/ntxent.py:44-75).

    Matches the reference exactly: the denominator masks only the
    self-similarity diagonal (positives *are* included in it), and the
    inputs are used as given (the model normalises before calling —
    src/models/contrastivemodel.py:163-164).
    """
    n = z_i.shape[0]
    z = jnp.concatenate([z_i, z_j], axis=0)
    sim = _cosine_sim_matrix(z)
    pos = jnp.concatenate([jnp.diagonal(sim, n), jnp.diagonal(sim, -n)])

    nominator = jnp.exp(pos / temperature)
    negatives_mask = 1.0 - jnp.eye(2 * n, dtype=jnp.float32)
    denominator = jnp.sum(negatives_mask * jnp.exp(sim / temperature), axis=1)
    return jnp.sum(-jnp.log(nominator / denominator)) / (2 * n)
