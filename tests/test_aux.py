"""Auxiliary subsystems: profiling, Grad-CAM, SSL online probe, loggers."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from devt_tpu.tools.gradcam import gradcam_resnet, show_cam_on_image
from devt_tpu.train.callbacks import SSLOnlineEval
from devt_tpu.train.loggers import JsonlLogger
from devt_tpu.train.metrics import RunningBuffers
from devt_tpu.train.profiling import StepTimer, annotate, trace


def test_step_timer_percentiles():
    import time

    t = StepTimer(warmup=0)
    for _ in range(5):
        t.mark_step()
        time.sleep(0.01)
    s = t.summary(items_per_step=8)
    assert 5 < s["step_ms_p50"] < 100
    assert s["items_per_sec"] > 0


def test_trace_writes_profile(tmp_path):
    with trace(str(tmp_path)):
        with annotate("compute"):
            jnp.ones((64, 64)).sum().block_until_ready()
    # profiler emits a plugins/profile/<run>/ directory
    found = []
    for root, _, files in os.walk(tmp_path):
        found.extend(files)
    assert found, "no profile artifacts written"


def test_gradcam_highlights_and_overlay():
    from devt_tpu.models.resnet import resnet18

    model = resnet18(output="logits", num_classes=5)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    cam = gradcam_resnet(model, variables, x, class_idx=1)
    assert cam.shape == (2, 2, 2)           # 64/32
    assert cam.min() >= 0.0 and cam.max() <= 1.0

    img = np.random.default_rng(1).random((64, 64, 3)).astype(np.float32)
    overlay = show_cam_on_image(img, cam[0])
    assert overlay.shape == (64, 64, 3) and overlay.dtype == np.uint8


def test_ssl_online_probe_learns():
    """The linear probe must fit separable detached embeddings."""
    rng = np.random.default_rng(0)
    n, d, c = 64, 16, 3
    labels_idx = rng.integers(0, c, n)
    centers = rng.standard_normal((c, d)) * 3
    z = centers[labels_idx] + 0.1 * rng.standard_normal((n, d))
    y = np.zeros((n, c), np.float32)
    y[np.arange(n), labels_idx] = 1.0

    probe = SSLOnlineEval(z_dim=d, num_classes=c, lr=0.05)
    logger = JsonlLogger(log_dir="/tmp/devt_probe_test", name="probe")
    aux = {"embedding": jnp.asarray(z), "label": jnp.asarray(y)}
    for step in range(200):
        probe.on_train_batch_end(aux, logger, step)

    buffers = RunningBuffers()
    probe.eval_batch(aux, buffers)
    labels, probs = buffers.concatenated()
    acc = (probs.argmax(-1) == labels.argmax(-1)).mean()
    assert acc > 0.9


def test_buffers_widen_bf16_for_sklearn_metrics():
    """bf16 eval outputs (ml_dtypes.bfloat16 — numpy dtype kind 'V',
    which sklearn rejects as non-numeric) must be widened at the buffer
    boundary so the TransformerEval metric stack runs.  Regression: a
    bf16 ViViT val epoch crashed average_precision_score."""
    from devt_tpu.train.metrics import (average_precision,
                                        f1_threshold_sweep, genre_report)

    rng = np.random.default_rng(0)
    buffers = RunningBuffers()
    for _ in range(2):
        buffers.append({
            "probs": jnp.asarray(rng.random((4, 5)), jnp.bfloat16),
            "label": jnp.asarray(
                (rng.random((4, 5)) < 0.4).astype(np.float32),
                jnp.bfloat16),
        })
    labels, probs = buffers.concatenated()
    assert probs.dtype == np.float32 and labels.dtype == np.float32
    assert np.isfinite(average_precision(labels, probs, "samples"))
    assert f1_threshold_sweep(labels, probs)
    assert "precision" in genre_report(labels, probs,
                                       [f"c{i}" for i in range(5)])


def test_jsonl_logger_roundtrip(tmp_path):
    logger = JsonlLogger(log_dir=str(tmp_path), name="t")
    logger.log({"a": 1.5, "b": "text"}, step=3)
    logger.log_text("report", "line1\nline2", step=4)
    logger.close()
    lines = [json.loads(l) for l in open(logger.path)]
    assert lines[0]["a"] == 1.5 and lines[0]["step"] == 3
    assert "line1" in lines[1]["report"]


def test_gradcam_r2plus1d_video_backbone():
    """Grad-CAM on the R(2+1)D layer4 activation — the reference's
    commented target vid_model.backbone.layer4[-1] (src/main.py:95-108)."""
    from devt_tpu.models.r2plus1d import r2plus1d_18
    from devt_tpu.tools.gradcam import gradcam_r2plus1d

    model = r2plus1d_18(output="logits", num_classes=5)
    clip = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 8, 32, 32, 3)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, clip)
    cam = gradcam_r2plus1d(model, variables, clip, class_idx=2)
    assert cam.shape == (1, 1, 2, 2)        # T 8/8, HW 32/16
    assert cam.min() >= 0.0 and cam.max() <= 1.0

    img = np.random.default_rng(1).random((32, 32, 3)).astype(np.float32)
    overlay = show_cam_on_image(img, cam[0, 0])
    assert overlay.shape == (32, 32, 3) and overlay.dtype == np.uint8


def test_profile_dir_flag_writes_trace(tmp_path):
    """--profile_dir wires jax.profiler into the harness fit loop
    (trace of train steps 2..8, TensorBoard-loadable)."""
    from devt_tpu.main import main as entry_main

    entry_main(["--model", "ptn", "--data_set", "synthetic", "--epochs",
                "1", "--batch_size", "2", "--seq_len", "3", "--nlayers",
                "1", "--input_dimension", "32", "--nhid", "32", "--nhead",
                "2", "--n_classes", "15", "--precision", "f32",
                "--max_steps", "10", "--attention_impl", "xla",
                "--dropout", "0.0", "--log_every", "4",
                "--profile_dir", str(tmp_path / "prof"),
                "--checkpoint_dir", str(tmp_path / "ck")])
    found = [f for _, _, fs in os.walk(tmp_path / "prof") for f in fs]
    assert found, "no profiler artifacts written"


def test_ssl_probe_dropout_is_used():
    """drop_p must affect probe training (ADVICE r2: it used to be
    accepted and silently ignored — identical updates for any value)."""
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    y = jnp.asarray((rng.random((16, 3)) < 0.4).astype(np.float32))
    aux = {"embedding": z, "label": y}
    logger = JsonlLogger(log_dir="/tmp/devt_probe_test", name="drop")

    p0 = SSLOnlineEval(z_dim=8, num_classes=3, drop_p=0.0, seed=3)
    p9 = SSLOnlineEval(z_dim=8, num_classes=3, drop_p=0.9, seed=3)
    p0.on_train_batch_end(aux, logger, 0)
    p9.on_train_batch_end(aux, logger, 0)
    diffs = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree_util.tree_leaves(p0.params),
                             jax.tree_util.tree_leaves(p9.params))]
    assert any(diffs)
    # eval path stays deterministic (no dropout at inference)
    l1 = p9._probe(p9.params, z)
    l2 = p9._probe(p9.params, z)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_ssl_val_logs_truth_guess_table(tmp_path):
    """Epoch end exports the per-sample truth/guess table — the
    reference's wandb.Table (src/callbacks/callbacks.py:285-291)."""
    rng = np.random.default_rng(2)
    probe = SSLOnlineEval(z_dim=8, num_classes=5, seed=1)
    logger = JsonlLogger(log_dir=str(tmp_path), name="tbl")
    buffers = RunningBuffers()
    aux = {"embedding": jnp.asarray(rng.standard_normal((30, 8)),
                                    jnp.float32),
           "label": jnp.asarray((rng.random((30, 5)) < 0.4)
                                .astype(np.float32))}
    probe.eval_batch(aux, buffers)
    probe.on_validation_epoch_end(buffers, logger, step=7)
    logger.close()
    recs = [json.loads(l) for l in open(logger.path)]
    tables = [r for r in recs if "val/online/table" in r]
    assert tables, "truth/guess table record missing"
    table = tables[0]["val/online/table"]
    assert table["columns"] == ["truth", "guess"]
    assert 0 < len(table["data"]) <= 20
    # entries are genre-name lists
    assert all(isinstance(row[0], list) and isinstance(row[1], list)
               for row in table["data"])


def test_mesh_fallback_warns_loudly(tmp_path, recwarn):
    """Round-4 verdict item 5: >1 visible device with a batch size that
    does not divide the data axis must WARN (stderr + warnings), not
    silently train on one device of the slice."""
    import warnings

    from devt_tpu.main import main as entry_main

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        entry_main(["--model", "ptn", "--data_set", "synthetic",
                    "--epochs", "1", "--batch_size", "3", "--seq_len",
                    "3", "--nlayers", "1", "--input_dimension", "32",
                    "--nhid", "32", "--nhead", "2", "--n_classes", "15",
                    "--precision", "f32", "--max_steps", "2",
                    "--attention_impl", "xla", "--dropout", "0.0",
                    "--checkpoint_dir", str(tmp_path / "ck")])
    msgs = [str(w.message) for w in caught
            if issubclass(w.category, RuntimeWarning)]
    assert any("mesh is DISABLED" in m and "batch_size=3" in m
               for m in msgs), msgs
