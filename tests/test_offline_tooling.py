"""Offline tooling: shot cutting, clip augments, builders, retrieval, admin."""

import os
import pickle
import random

import numpy as np
import pytest
from PIL import Image

from devt_tpu.data.manifests import stream_pickle
from devt_tpu.data_processing import audio_transforms, builders
from devt_tpu.data_processing.img_transforms import (Normaliser, augment_clip,
                                                     sample_clip_policy,
                                                     apply_policy)
from devt_tpu.data_processing.spatio_cut import SpatioCut
from devt_tpu.tools.admin import filter_manifest
from devt_tpu.tools.nearest_neighbour import RetrievalIndex


def _synthetic_video(n=48, size=32, shots=3, seed=0):
    """Frames with abrupt *colour-distribution* changes every n//shots
    frames (shot boundaries are histogram shifts, so each shot gets its
    own base colour — two different noise images share a histogram)."""
    rng = np.random.default_rng(seed)
    colours = [(200, 40, 40), (40, 200, 40), (40, 40, 200), (200, 200, 40)]
    frames = []
    for s in range(shots):
        base = np.tile(np.asarray(colours[s % 4], np.uint8),
                       (size, size, 1))
        for _ in range(n // shots):
            jitter = rng.integers(-20, 21, base.shape).astype(np.int16)
            frames.append(np.clip(base.astype(np.int16) + jitter,
                                  0, 255).astype(np.uint8))
    return np.stack(frames)


def test_spatio_cut_chunks():
    """The reference's test contract: 48 frames / 16 per chunk → 3 chunks
    of 16 (src/tests/test_transforms.py:13-21)."""
    video = _synthetic_video(48)
    chunks = SpatioCut().cut_vid(video, 16)
    assert len(chunks) == 3
    assert all(len(c) == 16 for c in chunks)


def test_spatio_cut_shot_aware():
    video = _synthetic_video(96, shots=3)
    cutter = SpatioCut(shot_threshold=0.3)
    from devt_tpu.data_processing.spatio_cut import detect_shot_boundaries
    bounds = detect_shot_boundaries(video, 0.3)
    assert len(bounds) == 3                     # three shots detected
    chunks = cutter.cut_vid(video, 16, shot_aware=True)
    assert len(chunks) == 6                     # 32 frames per shot → 2 each
    assert all(len(c) == 16 for c in chunks)


def test_spatio_cut_from_directory(tmp_path):
    video = _synthetic_video(32, shots=2)
    for i, f in enumerate(video):
        Image.fromarray(f).save(tmp_path / f"frame-{i:04d}.png")
    chunks = SpatioCut().cut_vid(str(tmp_path), 16)
    assert len(chunks) == 2


def test_clip_consistent_augmentation():
    """The same policy must hit every frame of a clip identically
    (img_transforms.py samples per clip)."""
    base = Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (64, 64, 3), dtype=np.uint8))
    frames = [base.copy() for _ in range(4)]
    out = augment_clip(frames, random.Random(5))
    arrs = [np.asarray(o) for o in out]
    # geometric part identical across frames (noise excluded: compare shape
    # and flip/crop via pixel-correlation of frame pairs)
    assert all(a.shape == arrs[0].shape for a in arrs)
    policy = sample_clip_policy(random.Random(5))
    a0 = np.asarray(apply_policy(base, policy))
    a1 = np.asarray(apply_policy(base, policy))
    np.testing.assert_array_equal(a0, a1)


def test_normaliser_specs():
    img = Image.fromarray(np.full((50, 70, 3), 100, np.uint8))
    norm = Normaliser()
    assert norm(img, "img").shape == (224, 224, 3)
    assert norm(img, "video").shape == (112, 112, 3)
    assert norm(img, "depth").shape == (384, 384, 3)
    with pytest.raises(KeyError):
        norm(img, "audio")


def test_audio_augments():
    rng = np.random.default_rng(0)
    pcm = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)).astype(np.float32)
    noisy = audio_transforms.add_gaussian_noise(pcm, rng)
    assert noisy.shape == pcm.shape and not np.allclose(noisy, pcm)
    shifted = audio_transforms.pitch_shift(pcm, 4.0)
    assert shifted.shape == pcm.shape
    # pitch up by 4 semitones → dominant frequency rises
    def dom_freq(x):
        return np.abs(np.fft.rfft(x)).argmax()
    assert dom_freq(shifted) > dom_freq(pcm)


def _make_corpus(root, n_movies=4, scenes=3, frames=12, experts=("img-embeddings",)):
    rng = np.random.default_rng(0)
    for m in range(n_movies):
        genre = ["Action", "Comedy"][m % 2]
        for s in range(scenes):
            sdir = os.path.join(root, genre, f"movie{m}", f"scene{s:02d}")
            os.makedirs(os.path.join(sdir, "imgs"), exist_ok=True)
            for f in range(frames):
                arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(sdir, "imgs", f"frame-{f:03d}.png"))
            for e in experts:
                np.save(os.path.join(sdir, f"{e}.npy"),
                        rng.standard_normal((1, 2048)).astype(np.float32))
    return root


def test_build_mmx_temporal_and_load(tmp_path):
    corpus = _make_corpus(str(tmp_path / "corpus"))
    out_train = str(tmp_path / "train.pkl")
    out_val = str(tmp_path / "val.pkl")
    n_train, n_val = builders.build_mmx_temporal(
        corpus, out_train, out_val, experts=("img-embeddings",), workers=2)
    assert n_train + n_val == 4
    recs = stream_pickle(out_train)
    assert "scenes" in recs[0] and "label" in recs[0]
    chunk = list(recs[0]["scenes"].values())[0]["000"]
    assert "img-embeddings" in chunk
    assert os.path.exists(chunk["img-embeddings"][0])


def test_build_mmx_frames(tmp_path):
    corpus = _make_corpus(str(tmp_path / "corpus"))
    out_train = str(tmp_path / "ftrain.pkl")
    out_val = str(tmp_path / "fval.pkl")
    builders.build_mmx_frames(corpus, out_train, out_val, min_frames=10,
                              pad_to=16, workers=1)
    recs = stream_pickle(out_train)
    frames = list(recs[0]["scenes"].values())[0][0]
    assert len(frames) == 16                  # repeat-padded from 12
    assert frames[-1] == frames[11]           # pad repeats last frame


def test_build_mit_temporal(tmp_path):
    rng = np.random.default_rng(1)
    root = str(tmp_path / "mit")
    for label in ("clapping", "dropping"):
        for v in range(2):
            for c in range(3):
                cdir = os.path.join(root, label, f"vid{v}", f"chunk{c:02d}")
                os.makedirs(cdir, exist_ok=True)
                np.save(os.path.join(cdir, "img-embeddings.npy"),
                        rng.standard_normal((1, 2048)).astype(np.float32))
    out = str(tmp_path / "mit.pkl")
    n = builders.build_mit_temporal(root, out, ("img-embeddings",),
                                    workers=1)
    assert n == 4
    recs = stream_pickle(out)
    assert recs[0]["label"] in ("clapping", "dropping")
    assert len(recs[0]["data"]) == 3


def test_numeric_sort():
    paths = ["f-10.png", "f-2.png", "f-1.png"]
    assert builders.numeric_sort(paths) == ["f-1.png", "f-2.png", "f-10.png"]


def test_retrieval_index_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    embed_dict = {
        i: {"path": f"p{i}", "embedding": rng.standard_normal(15).astype(
            np.float32), "predicted": ["Action"], "actual": ["Action"]}
        for i in range(30)
    }
    path = str(tmp_path / "embed_dict")
    with open(path, "wb") as f:
        pickle.dump(embed_dict, f)
    index = RetrievalIndex(path)
    results = index.neighbours_of(7, k=5)
    assert results[0][0] == 7                 # self is nearest
    assert len(results) == 5
    dists = [d for _, d, _ in results]
    assert dists == sorted(dists)


def test_projector_export(tmp_path):
    """TensorBoard-projector TSV export — twin of the reference's
    tsne_projection (nearest_neighbour.py:72-79)."""
    from devt_tpu.tools.nearest_neighbour import export_projector

    rng = np.random.default_rng(3)
    embed_dict = {
        i: {"path": f"clip{i}", "embedding": rng.standard_normal(15).astype(
            np.float32)} for i in range(6)
    }
    path = str(tmp_path / "embed_dict")
    with open(path, "wb") as f:
        pickle.dump(embed_dict, f)
    out = export_projector(RetrievalIndex(path), str(tmp_path / "proj"))
    vecs = [l.split("\t") for l in open(f"{out}/vectors.tsv")]
    meta = open(f"{out}/metadata.tsv").read().splitlines()
    assert len(vecs) == 6 and all(len(v) == 15 for v in vecs)
    assert meta == [f"clip{i}" for i in range(6)]
    assert "vectors.tsv" in open(f"{out}/projector_config.pbtxt").read()


def test_admin_filter(tmp_path):
    from devt_tpu.data.manifests import append_pickle
    src = str(tmp_path / "in.pkl")
    dst = str(tmp_path / "out.pkl")
    for i in range(5):
        append_pickle(src, {"path": f"movie{i}", "x": i})
    kept, dropped = filter_manifest(src, dst,
                                    keep=lambda r: "movie3" not in r["path"])
    assert (kept, dropped) == (4, 1)
    assert all("movie3" not in r["path"] for r in stream_pickle(dst))


def test_build_mit_contrastive_roundtrip(tmp_path):
    """build_mit_contrastive (create_mit_contrastive.py:14-77) → manifest →
    ContrastiveDataModule pair batches."""
    from devt_tpu.config import Config
    from devt_tpu.data.contrastive import ContrastiveDataModule

    rng = np.random.default_rng(3)
    root = str(tmp_path / "mit")
    for label in ("clapping", "dropping"):
        for v in range(3):
            for c in range(3):
                cdir = os.path.join(root, label, f"vid{v}", f"chunk{c:02d}")
                os.makedirs(cdir, exist_ok=True)
                np.save(os.path.join(cdir, "img-embeddings.npy"),
                        rng.standard_normal((1, 2048)).astype(np.float32))
    out = str(tmp_path / "mit_contrastive.pkl")
    n = builders.build_mit_contrastive(root, out, ("img-embeddings",),
                                       workers=1)
    assert n == 6
    recs = stream_pickle(out)
    assert set(recs[0]) == {"path", "label", "data"}
    assert len(recs[0]["data"]) == 3
    # chunk keys carry the directory basename like the reference
    assert all(k.startswith("chunk") for k in recs[0]["data"])

    cfg = Config(model="contrastive", batch_size=2, input_shape=2048,
                 experts=("img-embeddings",), aggregation="none")
    dm = ContrastiveDataModule(out, out, cfg).setup()
    batch = next(iter(dm.train_batches()))
    assert batch["x_i"].shape == (2, 2048)
    assert batch["x_j"].shape == (2, 2048)
    assert not np.allclose(batch["x_i"], batch["x_j"])
