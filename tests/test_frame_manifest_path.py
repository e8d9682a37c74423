"""Integration: offline frame-manifest builder → MMXFrameDataModule →
batches, plus Predictor.from_lightning_checkpoint."""

import os
import pickle

import numpy as np

from devt_tpu.config import Config
from devt_tpu.data.mmx_frame import MMXFrameDataModule
from devt_tpu.data.synthetic import write_fake_frame_corpus
from devt_tpu.data_processing import builders


def test_builder_to_frame_datamodule(tmp_path):
    corpus = write_fake_frame_corpus(str(tmp_path / "corpus"), n_movies=4,
                                     scenes_per_movie=3,
                                     frames_per_scene=12, size=96)
    train = str(tmp_path / "ftrain.pkl")
    val = str(tmp_path / "fval.pkl")
    n_train, n_val = builders.build_mmx_frames(
        corpus, train, val, min_frames=10, pad_to=16, workers=2)
    assert n_train + n_val == 4

    cfg = Config(model="vid", data_set="mmx-frame", batch_size=1, seq_len=2,
                 frame_len=4, n_classes=19)
    dm = MMXFrameDataModule(train, val, cfg).setup()
    batch = next(iter(dm.train_batches()))
    assert batch["vid"].shape == (1, 2, 4, 112, 112, 3)
    assert batch["label"].shape == (1, 19)
    assert np.isfinite(batch["vid"]).all()
    # frames were decoded (non-zero content for movies with enough frames)
    assert np.abs(batch["vid"]).sum() > 0


def test_predictor_from_lightning_checkpoint(tmp_path):
    """A reference-style .ckpt (torch pickle with state_dict) loads into
    the serving path end-to-end."""
    import torch

    from devt_tpu.serve import Predictor
    from tests.test_lightning_import import _encoder_sd, _t

    d, ff, nlayers = 64, 128, 2
    sd = {}
    sd.update(_encoder_sd("transformer_encoder0", d, ff, nlayers))
    sd.update(_encoder_sd("transformer_encoder1", d, ff, nlayers))
    sd["cls"] = _t(1, 2, d)
    sd["norm.weight"] = np.ones(d, np.float32)
    sd["norm.bias"] = np.zeros(d, np.float32)
    sd["mlp_head.0.weight"] = np.ones(d, np.float32)
    sd["mlp_head.0.bias"] = np.zeros(d, np.float32)
    sd["mlp_head.1.weight"] = _t(15, d)
    sd["mlp_head.1.bias"] = _t(15)
    ckpt = {"state_dict": {k: torch.tensor(v) for k, v in sd.items()},
            "epoch": 32, "global_step": 24947}
    path = str(tmp_path / "epoch=32-step=24947.ckpt")
    torch.save(ckpt, path)

    cfg = Config(model="ptn", batch_size=2, seq_len=3, nlayers=nlayers,
                 input_dimension=d, nhid=ff, nhead=2, n_classes=15,
                 dropout=0.0, precision="f32", attention_impl="xla",
                 experts=("a", "b"))
    pred = Predictor.from_lightning_checkpoint(cfg, path, buckets=(2,))
    out = pred.predict({"experts": np.zeros((2, 3, 2, d), np.float32)})
    assert out["scores"].shape == (2, 15)
    assert np.isfinite(out["scores"]).all()
