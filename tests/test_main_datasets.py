"""main.py end-to-end over every dataset dispatch path (synthetic corpora)."""

import numpy as np
import pytest

from devt_tpu import main as entry
from devt_tpu.data import synthetic

pytestmark = pytest.mark.slow


def test_main_mmx_temporal(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    train, val = synthetic.write_fake_expert_corpus(str(tmp_path / "c"),
                                                    n_movies=6)
    results = entry.main([
        "--model", "ptn", "--data_set", "mmx",
        "--train_manifest", train, "--val_manifest", val,
        "--epochs", "1", "--batch_size", "2", "--seq_len", "5",
        "--nlayers", "1", "--input_dimension", "2048", "--nhid", "64",
        "--nhead", "2", "--n_classes", "15", "--precision", "f32",
        "--attention_impl", "xla", "--dropout", "0.0", "--max_steps", "2",
        "--checkpoint_dir", str(tmp_path / "ck"),
        "--experts", "img-embeddings,location-embeddings,video-embeddings",
    ])
    assert np.isfinite(results["test/loss"])
    # TransformerEval's test-epoch dump writes the labels/logits pickles
    # into the RUN directory (save_path/name), never cwd (VERDICT r3 #7)
    run_dir = tmp_path / "trained_models" / "devt-tpu-run"
    assert (run_dir / "labels.pkl").exists()
    assert (run_dir / "logits.pkl").exists()
    assert not (tmp_path / "labels").exists()


def test_main_mit_temporal(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    train, val = synthetic.write_fake_mit_corpus(str(tmp_path / "c"))
    results = entry.main([
        "--model", "ptn", "--data_set", "mit",
        "--train_manifest", train, "--val_manifest", val,
        "--epochs", "1", "--batch_size", "2", "--seq_len", "4",
        "--nlayers", "1", "--input_dimension", "2048", "--nhid", "64",
        "--nhead", "2", "--n_classes", "305", "--precision", "f32",
        "--attention_impl", "xla", "--dropout", "0.0", "--max_steps", "2",
        "--cls", "1", "--checkpoint_dir", str(tmp_path / "ck"),
        "--experts", "img-embeddings,location-embeddings",
    ])
    assert np.isfinite(results["test/loss"])
    # MITEval ran (top-1 accuracy logged during fit's epoch-end validate)
    import glob
    logs = "".join(open(f).read()
                   for f in glob.glob(str(tmp_path / "runs" / "*" /
                                          "metrics.jsonl")))
    assert "val/accuracy/epoch" in logs


def test_main_contrastive(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    train, val = synthetic.write_fake_expert_corpus(str(tmp_path / "c"),
                                                    n_movies=6)
    results = entry.main([
        "--model", "contrastive", "--data_set", "mmx-contrastive",
        "--train_manifest", train, "--val_manifest", val,
        "--epochs", "1", "--batch_size", "2", "--aggregation", "none",
        "--input_shape", "2048", "--hidden_layer", "32",
        "--projection_size", "16", "--output_shape", "8",
        "--precision", "f32", "--opt", "adam", "--max_steps", "2",
        "--checkpoint_dir", str(tmp_path / "ck"),
        "--experts", "img-embeddings",
    ])
    assert np.isfinite(results["test/loss"])


def test_mit_label_resolution():
    """MIT string labels resolve through the bundled moments CSV."""
    from devt_tpu.data.manifests import load_moments_categories

    mapping = load_moments_categories()
    assert mapping["clapping"] == 0
    assert len(mapping) == 305
