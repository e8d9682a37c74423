"""Orbax checkpointing: params + optimizer state + step + config snapshot.

The reference leans on Lightning's implicit checkpointing
(``load_from_checkpoint`` with a hard-coded wandb run path,
src/main.py:89,111; ``ModelCheckpoint`` commented at src/main.py:57-58).
Here save/restore is explicit and complete: the full TrainState (params,
mutable model state, optimizer state, step) plus the config that produced
it, so restore-for-test (the reference's actual ``main.py`` behavior) and
resume-training both work.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp

from devt_tpu.config import Config
from devt_tpu.train.state import TrainState


def _payload(state: TrainState) -> dict[str, Any]:
    """ONE schema for sync and async saves — restore() mirrors it."""
    return {"step": state.step, "params": state.params,
            "model_state": state.model_state,
            "opt_state": state.opt_state}


def save(ckpt_dir: str, state: TrainState, config: Config,
         step: int | None = None) -> str:
    """Synchronous save: an AsyncSaver whose write is awaited."""
    with AsyncSaver() as saver:
        return saver.save(ckpt_dir, state, config, step)


class AsyncSaver:
    """Checkpoint saves that overlap training.

    Orbax's checkpointer stages the device→host copy at ``save()`` and
    streams the file write in the background; training resumes as soon as
    staging finishes rather than blocking on the disk write (the
    TPU-production shape — on a pod the write goes to GCS and can take
    longer than many steps).  The next ``save``/``close`` first waits for
    the in-flight write, so at most one write is outstanding and a crash
    mid-write leaves the previous complete checkpoint in place.
    """

    def __init__(self):
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, ckpt_dir: str, state: TrainState, config: Config,
             step: int | None = None) -> str:
        ckpt_dir = os.path.abspath(ckpt_dir)
        step = int(state.step) if step is None else step
        path = os.path.join(ckpt_dir, f"step_{step}")
        self._ckptr.wait_until_finished()     # ≤1 write outstanding
        self._ckptr.save(path, _payload(state), force=True)
        config.save_yaml(os.path.join(ckpt_dir, "config.yaml"))
        return path

    def wait(self) -> None:
        """Block until the in-flight write (if any) is finalized."""
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.wait_until_finished()
        self._ckptr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def restore(path: str, state: TrainState) -> TrainState:
    """Restore into an existing abstract/concrete state (shapes must match)."""
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path, _payload(state))
    return state.replace(step=payload["step"], params=payload["params"],
                         model_state=payload["model_state"],
                         opt_state=payload["opt_state"])


def prune_checkpoints(ckpt_dir: str, keep: int) -> None:
    """Retention policy: keep the ``keep`` highest-step ``step_*``
    checkpoints in ``ckpt_dir`` and delete the rest (used by the best-
    metric saver — the reference's ModelCheckpoint ``save_top_k`` intent,
    src/main.py:57-58)."""
    import shutil

    if not os.path.isdir(ckpt_dir) or keep < 1:
        return
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    for _, name in sorted(steps)[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps)[1])
