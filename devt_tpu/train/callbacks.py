"""Epoch-end evaluation callbacks.

Functional twins of the reference's Lightning callbacks
(src/callbacks/callbacks.py):

  * :class:`TransformerEval` — threshold-swept sample-F1, sklearn mAP
    (samples + weighted), per-class report at 0.3; on test, dumps
    labels/logits pickles (callbacks.py:27-82).
  * :class:`MITEval` — top-1 accuracy over the running buffers
    (callbacks.py:85-102).
  * :class:`DisplayResults` — exports ``{path, embedding, predicted,
    actual}`` per sample to an ``embed_dict`` pickle, feeding the retrieval
    tool (callbacks.py:105-144 → devt_tpu/tools/nearest_neighbour.py).
  * :class:`SSLOnlineEval` — online linear probe for the contrastive
    model: a small MLP trained on detached embeddings each train batch,
    evaluated with the F1/precision/recall/mAP sweep (callbacks.py:147-291).

Callbacks receive the host-side :class:`RunningBuffers` the harness fills
from eval-step aux — the JAX analogue of the modules' running lists.
"""

from __future__ import annotations

import os
import pickle
from typing import Sequence

import numpy as np

from devt_tpu.config import MMX_GENRES_15, MMX_GENRES_19
from devt_tpu.train import metrics as M


class Callback:
    def on_validation_epoch_end(self, buffers, logger, step): ...
    def on_test_epoch_end(self, buffers, logger, step): ...
    def on_train_batch_end(self, aux, logger, step): ...


class TransformerEval(Callback):
    def __init__(self, target_names: Sequence[str] = MMX_GENRES_19,
                 out_dir: str = "."):
        self.target_names = target_names
        self.out_dir = out_dir

    def on_validation_epoch_end(self, buffers, logger, step):
        if not len(buffers):
            return {}
        labels, probs = buffers.concatenated()
        scores = {f"val/online/{k}": v
                  for k, v in M.f1_threshold_sweep(labels, probs).items()}
        scores["sklearn apr"] = M.average_precision(labels, probs, "samples")
        scores["sklearn apr weighted"] = M.average_precision(
            labels, probs, "weighted")
        logger.log(scores, step)
        names = self.target_names[: labels.shape[1]]
        logger.log_text("val/report", M.genre_report(labels, probs, names),
                        step)
        buffers.reset()
        return scores

    def on_test_epoch_end(self, buffers, logger, step):
        if not len(buffers):
            return {}
        labels, probs = buffers.concatenated()
        # the reference pickles both buffers on test end (callbacks.py:76-79
        # — it writes labels twice; evident intent, labels + logits)
        os.makedirs(self.out_dir, exist_ok=True)
        with open(os.path.join(self.out_dir, "labels.pkl"), "wb") as fp:
            pickle.dump(labels, fp)
        with open(os.path.join(self.out_dir, "logits.pkl"), "wb") as fp:
            pickle.dump(probs, fp)
        names = self.target_names[: labels.shape[1]]
        report = M.genre_report(labels, probs, names)
        logger.log_text("test/report", report, step)
        buffers.reset()
        return report


class MITEval(Callback):
    def __init__(self):
        self.best_acc = 0.0

    def on_validation_epoch_end(self, buffers, logger, step):
        if not len(buffers):
            return {}
        labels, probs = buffers.concatenated()
        acc = M.top1_accuracy(labels, probs)
        logger.log({"val/accuracy/epoch": acc}, step)
        self.best_acc = max(self.best_acc, acc)
        buffers.reset()
        return {"val/accuracy/epoch": acc}


class DisplayResults(Callback):
    def __init__(self, target_names: Sequence[str] = MMX_GENRES_15,
                 out_path: str = "embed_dict.pkl", threshold: float = 0.3):
        self.target_names = target_names
        self.out_path = out_path
        self.threshold = threshold

    def n_to_labels(self, vector):
        return [self.target_names[i] for i, x in enumerate(vector) if x]

    def on_test_epoch_end(self, buffers, logger, step):
        labels, probs = buffers.concatenated()
        embeds = (np.concatenate(buffers.embeddings)
                  if buffers.embeddings else np.zeros((len(labels), 0)))
        paths = buffers.paths or list(range(len(labels)))
        preds = (probs > self.threshold).astype(int)
        cache = {
            i: {"path": paths[i], "embedding": embeds[i],
                "predicted": self.n_to_labels(preds[i]),
                "actual": self.n_to_labels(labels[i].astype(int))}
            for i in range(len(labels))
        }
        parent = os.path.dirname(self.out_path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        with open(self.out_path, "wb") as fp:
            pickle.dump(cache, fp)
        buffers.reset()
        return cache


class SSLOnlineEval(Callback):
    """Online linear probe on detached contrastive representations.

    The reference attaches an ``SSLEvaluator`` MLP and steps its own SGD
    on each train batch (callbacks.py:162-213).  Here the probe is a
    small jitted train step over a (hidden, out) MLP, fed the embeddings
    the harness exposes in train-step aux.
    """

    def __init__(self, z_dim: int, num_classes: int, hidden: int = 512,
                 lr: float = 0.005, drop_p: float = 0.1, seed: int = 0,
                 target_names: Sequence[str] = MMX_GENRES_15):
        import jax
        import jax.numpy as jnp
        import optax

        from devt_tpu.models import losses

        self.thresholds = (0.0, 0.1, 0.2, 0.3, 0.4, 0.5)
        self.target_names = target_names
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        scale1 = (2.0 / z_dim) ** 0.5
        scale2 = (2.0 / hidden) ** 0.5
        self.params = {
            "w1": jax.random.normal(k1, (z_dim, hidden)) * scale1,
            "b1": jnp.zeros((hidden,)),
            "w2": jax.random.normal(k2, (hidden, num_classes)) * scale2,
            "b2": jnp.zeros((num_classes,)),
        }
        self.tx = optax.sgd(lr)
        self.opt_state = self.tx.init(self.params)
        self._rng = jax.random.PRNGKey(seed + 1)

        def probe_logits(params, z, rng=None):
            # dropout p on the hidden activations while the probe trains
            # (the reference's SSLEvaluator carries Dropout(drop_p),
            # callbacks.py:162-167 via pl_bolts); eval is deterministic
            h = jnp.maximum(z @ params["w1"] + params["b1"], 0.0)
            if rng is not None and drop_p > 0.0:
                keep = jax.random.bernoulli(rng, 1.0 - drop_p, h.shape)
                h = jnp.where(keep, h / (1.0 - drop_p), 0.0)
            return h @ params["w2"] + params["b2"]

        def loss_fn(params, z, y, rng):
            probs = jax.nn.sigmoid(probe_logits(params, z, rng))
            return losses.bce(probs, y)

        @jax.jit
        def train_probe(params, opt_state, z, y, rng):
            loss, grads = jax.value_and_grad(loss_fn)(params, z, y, rng)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._train_probe = train_probe
        self._probe = jax.jit(probe_logits)

    def on_train_batch_end(self, aux, logger, step):
        import jax
        z = jax.lax.stop_gradient(aux["embedding"])
        self._rng, sub = jax.random.split(self._rng)
        self.params, self.opt_state, loss = self._train_probe(
            self.params, self.opt_state, z, aux["label"], sub)
        logger.log({"train/online/loss": float(loss)}, step)

    def eval_batch(self, aux, buffers):
        import jax
        logits = self._probe(self.params, aux["embedding"])
        probs = jax.nn.sigmoid(logits)
        buffers.append({"probs": probs, "label": aux["label"]})

    def on_validation_epoch_end(self, buffers, logger, step):
        from sklearn.metrics import (average_precision_score, f1_score,
                                     precision_score, recall_score)
        labels, probs = buffers.concatenated()
        labels = labels.astype(int)
        out = {}
        for t in self.thresholds:
            preds = (probs > t).astype(int)
            out[f"val/online/f1@{t}"] = float(
                f1_score(labels, preds, average="weighted", zero_division=1))
            out[f"val/online/recall@{t}"] = float(
                recall_score(labels, preds, average="weighted",
                             zero_division=1))
            out[f"val/online/precision@{t}"] = float(
                precision_score(labels, preds, average="weighted",
                                zero_division=1))
            out[f"val/online/avg_precision@{t}"] = float(
                average_precision_score(labels, preds, average="weighted"))
        logger.log(out, step)
        # per-sample truth/guess table of the first 20 samples @0.3 — the
        # reference's wandb.Table (src/callbacks/callbacks.py:285-291)
        names = self.target_names[: labels.shape[1]]

        def translate(vec):
            return [names[i] for i, x in enumerate(vec) if x and i < len(names)]

        guesses = (probs > 0.3).astype(int)
        rows = [(translate(labels[i]), translate(guesses[i]))
                for i in range(min(20, len(labels)))]
        if hasattr(logger, "log_table"):
            logger.log_table("val/online/table", ["truth", "guess"], rows,
                             step)
        buffers.reset()
        return out
