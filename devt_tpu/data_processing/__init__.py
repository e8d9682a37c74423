"""Offline corpus tooling (L0): shot cutting, transforms, manifest builders.

Capability map to the reference (SURVEY.md §2.5):
  spatio_cut.py       ← src/data_processing/transforms/spatio_cut.py
  img_transforms.py   ← src/data_processing/transforms/img_transforms.py
  audio_transforms.py ← src/data_processing/transforms/audio_transforms.py
  builders.py         ← src/data_processing/{temporal,contrastive}/create_*.py
"""
