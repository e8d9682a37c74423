"""End-to-end: synthetic frame corpus → native decode → Trainer.fit →
callbacks → checkpoint → serve.  The full user path on real image files."""

import os

import numpy as np

from devt_tpu.config import Config
from devt_tpu.data import synthetic
from devt_tpu.data.mmx_frame import MMXLightDataModule
from devt_tpu.models.frame_transformer import FrameTransformer
from devt_tpu.train.callbacks import TransformerEval
from devt_tpu.train.harness import Trainer
from devt_tpu.train.loggers import JsonlLogger
import pytest

pytestmark = pytest.mark.slow


class _TinyLightModule(MMXLightDataModule):
    """MMXLight with a tiny train/val split for a 4-movie corpus."""

    def setup(self):
        from devt_tpu.data import manifests

        self.train_df, self.val_df = manifests.load_csv_manifest(
            self.csv_path, shuffle_seed=0, train_rows=3, val_rows=1)
        self.train_steps = max(len(self.train_df) // self.config.batch_size,
                               1)
        return self


def test_vid_model_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    csv_path = synthetic.write_fake_light_csv(str(tmp_path), n_movies=4,
                                              scenes_per_movie=2,
                                              frames_per_scene=4, size=128)
    cfg = Config(model="vid", data_set="mmx-frame", batch_size=1, seq_len=2,
                 frame_len=4, n_classes=19, epochs=1, max_steps=2,
                 precision="f32", attention_impl="xla", dropout=0.0,
                 opt="adamW", learning_rate=1e-4, log_every=1,
                 checkpoint_dir=str(tmp_path / "ckpt"))
    # real 112x112 clips; 2 scenes x 4 frames keeps CPU time modest
    model = FrameTransformer(model="vid", seq_len=2, frame_len=4,
                             n_classes=19, attention_impl="xla")

    dm = _TinyLightModule(csv_path, cfg)
    logger = JsonlLogger(log_dir=str(tmp_path / "runs"), name="e2e")
    trainer = Trainer(cfg, callbacks=[TransformerEval()], logger=logger)
    state = trainer.fit(model, dm)
    assert int(state.step) == 2

    results = trainer.test(model, dm, state=state)
    assert "test/loss" in results and np.isfinite(results["test/loss"])
    # checkpoint written
    assert os.path.exists(tmp_path / "ckpt" / "config.yaml")
    # metrics logged
    lines = open(logger.path).read()
    assert "train/loss" in lines


def test_distributed_initialize_single_host_noop():
    from devt_tpu.parallel.distributed import initialize, runtime_info

    assert initialize() is False
    info = runtime_info()
    assert info["process_count"] == 1
    assert info["global_devices"] == 8   # virtual CPU mesh


def test_vivit_token_wire_end_to_end(tmp_path, monkeypatch):
    """The flagship ViViT trains on a real PNG corpus over the
    pre-patchified token wire: native decode → u8 (T,196,768) tokens →
    Loader → Trainer.fit → test.  The conv patch embed never runs — the
    model consumes the native loader's layout directly."""
    from devt_tpu import native
    from devt_tpu.models.vivit import ViViT

    if not native.available():
        pytest.skip("native library not built")
    monkeypatch.chdir(tmp_path)
    csv_path = synthetic.write_fake_light_csv(str(tmp_path), n_movies=4,
                                              scenes_per_movie=2,
                                              frames_per_scene=4, size=96)
    cfg = Config(model="vivit", data_set="mmx-frame", batch_size=1,
                 frame_len=4, n_classes=19, epochs=1, max_steps=2,
                 precision="f32", attention_impl="xla", dropout=0.0,
                 opt="adamW", learning_rate=1e-4, log_every=1,
                 wire_format="u8_tokens",
                 checkpoint_dir=str(tmp_path / "ckpt"))
    model = ViViT(image_size=224, patch_size=16, num_classes=19,
                  num_frames=4, dim=32, depth=1, heads=2, dim_head=16,
                  channels_last=True, attention_impl="xla", dropout=0.0)

    dm = _TinyLightModule(csv_path, cfg)
    logger = JsonlLogger(log_dir=str(tmp_path / "runs"), name="e2e_tok")
    trainer = Trainer(cfg, callbacks=[TransformerEval()], logger=logger)
    state = trainer.fit(model, dm)
    assert int(state.step) == 2

    results = trainer.test(model, dm, state=state)
    assert "test/loss" in results and np.isfinite(results["test/loss"])
