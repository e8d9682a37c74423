"""Epoch-level evaluation metrics.

Host-side equivalents of the reference's callback metrics
(src/callbacks/callbacks.py): sample-averaged F1 swept over thresholds
(callbacks.py:36-44), sklearn average-precision samples/weighted
(callbacks.py:49-55), per-class classification report (callbacks.py:59),
and MIT top-1 accuracy (callbacks.py:90-94).

Step-level running metrics (the torchmetrics ``AveragePrecision`` of
frame_transformer.py:116,119) are served by ``average_precision`` here on
the accumulated buffers — numerically the sklearn 'macro' definition.

sklearn is used directly where the reference used it (it is a host-side,
epoch-cadence computation — nothing device-critical).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from sklearn.metrics import (average_precision_score, classification_report,
                             f1_score)

F1_THRESHOLDS = (0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8)
REPORT_THRESHOLD = 0.3


def f1_threshold_sweep(labels: np.ndarray, probs: np.ndarray,
                       thresholds: Sequence[float] = F1_THRESHOLDS,
                       average: str = "samples") -> dict[str, float]:
    """``{"f1@t": score}`` — callbacks.py:36-44 semantics
    (zero_division=0, sample averaging)."""
    labels = np.asarray(labels).astype(int)
    out = {}
    for t in thresholds:
        preds = (np.asarray(probs) > t).astype(int)
        out[f"f1@{t}"] = float(f1_score(labels, preds, average=average,
                                        zero_division=0))
    return out


def average_precision(labels: np.ndarray, probs: np.ndarray,
                      average: str = "samples") -> float:
    """sklearn mAP ('samples' or 'weighted') — callbacks.py:49-55."""
    return float(average_precision_score(np.asarray(labels).astype(int),
                                         np.asarray(probs), average=average))


def genre_report(labels: np.ndarray, probs: np.ndarray,
                 target_names: Sequence[str],
                 threshold: float = REPORT_THRESHOLD) -> str:
    """Per-class precision/recall/F1 table at threshold 0.3 —
    callbacks.py:59,82."""
    preds = (np.asarray(probs) > threshold).astype(int)
    return classification_report(np.asarray(labels).astype(int), preds,
                                 target_names=list(target_names),
                                 zero_division=0)


def top1_accuracy(labels: np.ndarray, probs: np.ndarray) -> float:
    """MIT single-label top-1 (callbacks.py:90-94; the reference compares
    pre-computed predictions — here argmax over class scores)."""
    labels = np.asarray(labels)
    preds = np.asarray(probs).argmax(axis=-1)
    if labels.ndim > 1:
        labels = labels.argmax(axis=-1)
    return float((preds == labels).mean())


class RunningBuffers:
    """The ``running_logits``/``running_labels`` accumulation pattern
    (src/models/transformer.py:50-51,154-158) as an explicit object."""

    def __init__(self):
        self.probs: list[np.ndarray] = []
        self.labels: list[np.ndarray] = []
        self.embeddings: list[np.ndarray] = []
        self.paths: list = []

    def append(self, aux: dict) -> None:
        # bf16 device arrays arrive as ml_dtypes.bfloat16, whose numpy
        # dtype kind sklearn rejects as non-numeric — widen at the host
        # boundary so every downstream metric sees a plain float dtype
        self.probs.append(np.asarray(aux["probs"], dtype=np.float32))
        self.labels.append(np.asarray(aux["label"], dtype=np.float32))
        if aux.get("embedding") is not None:
            self.embeddings.append(
                np.asarray(aux["embedding"], dtype=np.float32))
        if aux.get("path") is not None:
            self.paths.extend(list(aux["path"]))

    def concatenated(self) -> tuple[np.ndarray, np.ndarray]:
        return (np.concatenate(self.labels), np.concatenate(self.probs))

    def reset(self) -> None:
        self.probs.clear()
        self.labels.clear()
        self.embeddings.clear()
        self.paths.clear()

    def __len__(self) -> int:
        return len(self.probs)
