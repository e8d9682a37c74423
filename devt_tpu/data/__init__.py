"""Host input pipeline: manifests, packing, augmentation, datamodules.

Capability map to the reference (SURVEY.md §2.3):
  manifests.py     ← pickle/CSV manifest readers (append-streamed pickles)
  transforms.py    ← train/val image & clip transforms, expert augmentation
  mmx_temporal.py  ← dataloaders/mmx/MMX_Temporal_dl.py (expert sequences)
  mmx_frame.py     ← dataloaders/mmx/MMX_Frame_dl.py + MMX_Light_dl.py
  mit_temporal.py  ← dataloaders/mit/MIT_Temporal_dl.py
  contrastive.py   ← dataloaders mmx/mit *_Contrastive_dl.py (pair sampling)
  samplers.py      ← WeightedRandomSampler equivalent
  synthetic.py     ← synthetic corpus/fixture generators for tests/bench
  pipeline.py      ← batching, per-host sharding, device prefetch

All datamodules expose ``setup() / train_batches() / val_batches() /
test_batches()`` yielding fixed-shape numpy batch dicts — the static-shape
contract the TPU step requires (ragged data is padded/cycled at pack time,
preserving each reference loader's padding semantics).
"""
