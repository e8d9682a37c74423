"""Manifest readers: append-streamed pickles and CSV corpora.

The reference's offline tooling dumps one pickled record at a time into an
open file (src/data_processing/temporal/create_mmx_temporal.py:199-207),
and the loaders re-read them in a loop until EOF
(src/dataloaders/mmx/MMX_Temporal_dl.py:70-86).  Records are dicts like
``{"label": [...], "path": str, "scenes": {scene_id: {expert: [paths]}}}``.

Tensor payloads: the reference stores per-scene expert embeddings as torch
``.pt`` files (MMX_Temporal_dl.py:134-136); this framework writes ``.npy``
from its own extraction tooling and *also* reads ``.pt`` (via torch, when
importable) so an existing reference corpus drops in unchanged.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Iterator

import numpy as np


def stream_pickle(path: str) -> list[Any]:
    """Read every record from an append-streamed pickle file."""
    records = []
    with open(path, "rb") as f:
        while True:
            try:
                records.append(pickle.load(f))
            except EOFError:
                break
    return records


def append_pickle(path: str, record: Any) -> None:
    """Append one record (the writer half of the streamed format)."""
    with open(path, "ab") as f:
        pickle.dump(record, f)


def load_manifest(path: str):
    """Streamed pickle → pandas DataFrame (MMX_Temporal_dl.py:70-86)."""
    import pandas as pd

    return pd.DataFrame(stream_pickle(path))


def load_tensor(path: str, width: int | None = 2048) -> np.ndarray:
    """Load one expert embedding: ``.npy`` natively, ``.pt`` via torch.

    Returns shape (1, width) f32, zero-padded on the feature dim
    (MMX_Temporal_dl.py:155-174 semantics; missing file → zeros)."""
    from devt_tpu.data.transforms import pad_to_width

    try:
        if path.endswith(".npy"):
            arr = np.load(path)
        else:
            import torch

            arr = torch.load(path, map_location="cpu",
                             weights_only=False)
            arr = np.asarray(arr.detach().cpu().numpy()
                             if hasattr(arr, "detach") else arr)
    except (FileNotFoundError, OSError):
        return np.zeros((1, width or 2048), np.float32)
    arr = np.asarray(arr, np.float32)
    if arr.ndim == 1:
        arr = arr[None, :]
    if width is not None:
        arr = pad_to_width(arr, width)
    return arr


def clean_mmx_temporal(df, target_names, min_scenes: int = 5):
    """Drop rows whose labels are all outside the genre set or with fewer
    than ``min_scenes`` scenes (MMX_Temporal_dl.py:42-68)."""
    keep = []
    for i in range(len(df)):
        label = df.at[i, "label"]
        flat = label[0] if len(label) and isinstance(label[0],
                                                     (list, tuple)) else label
        bad = sum(1 for l in flat if l not in target_names)
        if bad == 6:
            continue
        if len(df.at[i, "scenes"]) < min_scenes:
            continue
        keep.append(i)
    return df.iloc[keep].reset_index(drop=True)


def load_csv_manifest(path: str, shuffle_seed: int | None = 1130,
                      train_rows: int = 6047, val_rows: int = 653):
    """CSV corpus (``out.csv`` with img_root + g1..g6 genre columns) with
    the reference's shuffle + fixed train/val split
    (MMX_Light_dl.py:133-141)."""
    import pandas as pd

    df = pd.read_csv(path)
    if shuffle_seed is not None:
        df = df.sample(frac=1.0, random_state=shuffle_seed)
    train = df.iloc[:train_rows].reset_index(drop=True)
    val = df.iloc[train_rows:train_rows + val_rows].reset_index(drop=True)
    return train, val


def load_moments_categories(path: str | None = None) -> dict[str, int]:
    """MIT label → id map (src/data_processing/labels/moments_categories.csv,
    used at MIT_Temporal_dl.py:204-212).  Defaults to the copy bundled with
    this package."""
    if path is None:
        path = os.path.join(os.path.dirname(__file__), "labels",
                            "moments_categories.csv")
    import csv

    mapping: dict[str, int] = {}
    with open(path) as f:
        for row in csv.DictReader(f):
            mapping[row["label"]] = int(row["id"])
    return mapping
