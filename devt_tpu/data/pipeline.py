"""Batching, shuffling, per-host sharding, worker parallelism, prefetch.

The execution layer under every datamodule — the role torch ``DataLoader``
plays in the reference (workers + collate, MMX_Temporal_dl.py:95-102),
rebuilt for TPU training:

  * fixed-shape numpy batches (drop_last always — the reference also
    drops, and static shapes are mandatory for jit);
  * **per-host sharding built in**: each JAX process reads only its
    ``process_index``-th slice of every epoch's index permutation — the
    DALI ``shard_id=global_rank`` idea (MMX_Light_dl.py:143-144) done
    properly;
  * thread-pool item assembly (PIL decode releases the GIL; the C++
    decode module in devt_tpu/native slots under this same interface);
  * a small prefetch queue so host assembly overlaps device steps.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Protocol, Sequence

import numpy as np


class MapDataset(Protocol):
    def __len__(self) -> int: ...
    def __getitem__(self, idx: int) -> dict[str, np.ndarray]: ...


def _collate(items: Sequence[dict]) -> dict[str, np.ndarray]:
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray) or (
                np.isscalar(vals[0]) and not isinstance(vals[0], str)):
            out[key] = np.stack(vals)
        else:
            out[key] = vals          # e.g. paths — kept as a list
    return out


class Loader:
    """Epoch iterator over a map-style dataset."""

    def __init__(self, dataset: MapDataset, batch_size: int,
                 shuffle: bool = False, seed: int = 0,
                 sampler: Callable[[np.random.Generator], np.ndarray] | None = None,
                 num_workers: int = 4, prefetch: int = 2,
                 process_index: int | None = None,
                 process_count: int | None = None):
        import os

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.sampler = sampler
        # more assembly threads than cores measurably hurts (the native
        # decoder already threads internally): cap at the host core count
        self.num_workers = min(num_workers, os.cpu_count() or num_workers)
        self.prefetch = prefetch
        if process_index is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        self.process_index = process_index
        self.process_count = process_count or 1
        self._epoch = 0
        self._skip_batches = 0

    def __len__(self) -> int:
        per_host = len(self.dataset) // self.process_count
        return per_host // self.batch_size

    def set_epoch(self, epoch: int, skip_batches: int = 0) -> None:
        """Position the stream: the next ``__iter__`` runs epoch ``epoch``'s
        permutation (``default_rng(seed + epoch)`` — the torch
        ``DataLoader(shuffle=True)`` reshuffle-per-epoch contract the
        reference trains under, src/dataloaders/MMX_Temporal_dl.py), minus
        its first ``skip_batches`` batches (step-exact resume from a
        mid-epoch checkpoint).  The Trainer calls this every epoch; a
        fresh Loader otherwise replays epoch 0's order."""
        self._epoch = int(epoch)
        self._skip_batches = int(skip_batches)

    def _epoch_indices(self) -> np.ndarray:
        rng = np.random.default_rng(self.seed + self._epoch)
        if self.sampler is not None:
            idx = self.sampler(rng)
        elif self.shuffle:
            idx = rng.permutation(len(self.dataset))
        else:
            idx = np.arange(len(self.dataset))
        # per-host shard: contiguous split of the (shared-seed) permutation
        per_host = len(idx) // self.process_count
        start = self.process_index * per_host
        return idx[start:start + per_host]

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        indices = self._epoch_indices()
        self._epoch += 1
        n_batches = len(indices) // self.batch_size
        if self._skip_batches:
            # step-exact resume: drop the batches a checkpointed run
            # already consumed at the INDEX level (no decode cost), so
            # the stream continues exactly where it left off
            skip = min(self._skip_batches, n_batches)
            indices = indices[skip * self.batch_size:]
            n_batches -= skip
            self._skip_batches = 0
        if n_batches == 0:
            return

        # fill-into fast path: a dataset exposing ``item_spec`` (key ->
        # (shape, dtype)) and ``getitem_into(idx, out)`` writes each
        # sample DIRECTLY into its slot of the preallocated batch buffer
        # — the np.stack copy of the generic collate disappears, halving
        # per-sample host byte traffic (the native batch decoder works
        # the same way; this extends the contract to python datasets)
        fill = getattr(self.dataset, "getitem_into", None)
        spec = getattr(self.dataset, "item_spec", None)

        def assemble(b: int) -> dict[str, np.ndarray]:
            batch_idx = indices[b * self.batch_size:(b + 1) * self.batch_size]
            if fill is not None and spec is not None:
                out = {k: np.empty((len(batch_idx),) + tuple(s), d)
                       for k, (s, d) in spec.items()}
                for j, i in enumerate(batch_idx):
                    fill(int(i), {k: v[j] for k, v in out.items()})
                return out
            items = [self.dataset[int(i)] for i in batch_idx]
            return _collate(items)

        if self.num_workers <= 1:
            for b in range(n_batches):
                yield assemble(b)
            return

        # overlapped assembly: a bounded queue of ready batches.  A worker
        # exception is forwarded to the consumer (never a silent hang).
        # Submission is windowed — at most prefetch+num_workers futures in
        # flight, each dropped after hand-off — so host memory is bounded
        # by the queue, not the epoch length.
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()
        window = self.prefetch + self.num_workers

        def producer():
            try:
                from collections import deque

                with ThreadPoolExecutor(self.num_workers) as pool:
                    inflight: deque = deque()
                    for b in range(min(window, n_batches)):
                        inflight.append(pool.submit(assemble, b))
                    next_b = len(inflight)
                    while inflight:
                        q.put(inflight.popleft().result())
                        if next_b < n_batches:
                            inflight.append(pool.submit(assemble, next_b))
                            next_b += 1
                q.put(stop)
            except BaseException as e:  # noqa: BLE001 — forwarded
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        t.join()


def device_prefetch(iterator, placer: Callable | None = None, depth: int = 2):
    """Move batches to device ``depth`` steps ahead of consumption.

    Batch fetch AND host→device placement run on a dedicated thread, so
    the consumer's critical path never pays transfer serialization: the
    H2D copy of step N+1 overlaps both step N's device compute and the
    loader's decode threads (on the tunneled single-chip link the copy is
    mostly network wait, which releases the GIL).  At most ``depth``
    placed batches are alive on device at once."""
    import queue as _queue
    import threading

    import jax

    placer = placer or (lambda b: jax.tree_util.tree_map(
        jax.numpy.asarray, b))
    q: _queue.Queue = _queue.Queue(maxsize=depth)
    done = threading.Event()
    stop = object()

    def put_or_abandon(item) -> bool:
        """Bounded put that gives up when the consumer is gone (the
        generator's finally sets ``done``) — the worker must never block
        forever on a full queue, or it leaks the thread plus ``depth``
        device-resident batches."""
        while not done.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except _queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not put_or_abandon(placer(item)):
                    return
            put_or_abandon(stop)
        except BaseException as e:  # noqa: BLE001 — forwarded to consumer
            put_or_abandon(e)

    t = threading.Thread(target=worker, daemon=True,
                         name="devt-device-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        done.set()
