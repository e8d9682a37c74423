"""Trainer with an explicit device mesh (DP×TP) over the virtual 8-CPU mesh,
plus CLI smoke for the tools."""

import numpy as np

from devt_tpu.config import Config
from devt_tpu.data.synthetic import SyntheticDataModule
from devt_tpu.registry import build_model
from devt_tpu.train.harness import Trainer
from devt_tpu.train.loggers import JsonlLogger
import pytest

pytestmark = pytest.mark.slow


def test_trainer_fit_on_mesh(tmp_path):
    cfg = Config(model="ptn", data_set="synthetic", batch_size=8, seq_len=3,
                 nlayers=1, input_dimension=64, nhid=64, nhead=2,
                 n_classes=15, dropout=0.0, precision="f32",
                 attention_impl="xla", epochs=1, max_steps=2, log_every=1,
                 dp=4, mp=2, experts=("a", "b"),
                 checkpoint_dir=str(tmp_path / "ck"))
    model = build_model(cfg)
    dm = SyntheticDataModule(cfg, train_size=16, val_size=8)
    trainer = Trainer(cfg, logger=JsonlLogger(log_dir=str(tmp_path), name="m"),
                      use_mesh=True)
    assert trainer.mesh is not None and trainer.mesh.shape == {
        "data": 4, "model": 2}
    state = trainer.fit(model, dm)
    assert int(state.step) == 2
    # params ended up sharded over the model axis
    kern = state.params["encoder_0"]["layer_0"]["self_attn"]["in_proj"]["kernel"]
    assert len(kern.sharding.device_set) >= 2
    results = trainer.test(model, dm, state=state)
    assert np.isfinite(results["test/loss"])


def test_tools_cli(tmp_path, capsys, monkeypatch):
    import pickle

    from devt_tpu.data.manifests import append_pickle
    from devt_tpu.tools import admin, nearest_neighbour

    # admin CLI
    src = str(tmp_path / "in.pkl")
    for i in range(4):
        append_pickle(src, {"path": f"m{i}"})
    admin.main([src, str(tmp_path / "out.pkl"), "--drop-path", "m2"])
    out = capsys.readouterr().out
    assert "kept 3, dropped 1" in out

    # retrieval CLI
    rng = np.random.default_rng(0)
    embed = {i: {"path": f"p{i}", "embedding":
                 rng.standard_normal(15).astype(np.float32),
                 "predicted": [], "actual": []} for i in range(10)}
    ep = str(tmp_path / "embed_dict")
    with open(ep, "wb") as f:
        pickle.dump(embed, f)
    nearest_neighbour.main([ep, "--query", "3", "--k", "4"])
    out = capsys.readouterr().out
    result_lines = [l for l in out.splitlines() if l.startswith("#")]
    assert "query #3" in out and len(result_lines) == 4
