"""Optional Grain-backed execution for the datamodules.

The build plan (SURVEY.md §7 step 5) names Grain as the host-pipeline
substrate.  devt_tpu's own :class:`devt_tpu.data.pipeline.Loader` is the
default (zero extra deps, exception-forwarding, native-decoder friendly);
this adapter runs the SAME map-style datasets under ``grain`` when the
package is available — useful for its multiprocessing workers and
deterministic-resume machinery on big corpora.

Per-host sharding uses the same contract as the built-in loader:
``shard_options = grain.ShardOptions(process_index, process_count)``.
"""

from __future__ import annotations

from typing import Any


def available() -> bool:
    try:
        import grain  # noqa: F401

        return True
    except ImportError:
        return False


def make_grain_loader(dataset, batch_size: int, *, shuffle: bool = False,
                      seed: int = 0, num_epochs: int = 1,
                      num_workers: int = 0,
                      process_index: int | None = None,
                      process_count: int | None = None):
    """Wrap a devt_tpu map-style dataset (len + __getitem__ → dict of
    numpy) into a ``grain.DataLoader`` yielding collated batches."""
    import grain.python as grain_py
    import jax

    if process_index is None:
        process_index = jax.process_index()
        process_count = jax.process_count()

    class _Source(grain_py.RandomAccessDataSource):
        def __len__(self):
            return len(dataset)

        def __getitem__(self, idx):
            return dataset[int(idx)]

    sampler = grain_py.IndexSampler(
        num_records=len(dataset),
        shard_options=grain_py.ShardOptions(
            shard_index=process_index, shard_count=process_count or 1,
            drop_remainder=True),
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )
    return grain_py.DataLoader(
        data_source=_Source(),
        sampler=sampler,
        operations=[grain_py.Batch(batch_size=batch_size,
                                   drop_remainder=True)],
        worker_count=num_workers,
    )
