"""Training system tests: step correctness, grad accumulation, DP/TP mesh,
checkpointing, and the config-driven entry point — on the virtual 8-device
CPU mesh (conftest)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from devt_tpu.config import Config
from devt_tpu.models.ptn import PTN
from devt_tpu.models.basicmlp import BasicMLP
from devt_tpu.parallel.mesh import make_mesh, shard_batch
from devt_tpu.parallel.sharding import param_partition_specs, shard_variables
from devt_tpu.parallel.train_step import make_eval_step, make_train_step
from devt_tpu.train.optimizers import build_optimizer
from devt_tpu.train.state import TrainState
from devt_tpu.train.steps import forward_and_loss

RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


def _tiny_ptn_setup(accum=1, batch=8):
    cfg = Config(model="ptn", batch_size=batch, seq_len=4, nlayers=1,
                 input_dimension=64, nhid=64, nhead=2, dropout=0.0,
                 n_classes=15, experts=("a", "b"), learning_rate=1e-3,
                 opt="adamW", accum_steps=accum, precision="f32",
                 attention_impl="xla")
    model = PTN(input_dimension=64, nhead=2, nhid=64, nlayers=1,
                num_experts=2, seq_len=4, n_classes=15, dropout=0.0,
                attention_impl="xla")
    rng = np.random.default_rng(0)
    batch_d = {"experts": rng.standard_normal((batch, 4, 2, 64),
                                              dtype=np.float32),
               "label": (rng.random((batch, 15)) < 0.3).astype(np.float32)}
    variables = model.init(RNGS, jnp.asarray(batch_d["experts"]))
    tx = build_optimizer(cfg)
    state = TrainState.create(variables["params"], tx)
    return cfg, model, state, batch_d


def test_train_step_decreases_loss():
    cfg, model, state, batch = _tiny_ptn_setup()
    step = make_train_step(model, cfg)
    rng = jax.random.PRNGKey(0)
    first = None
    for _ in range(20):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first


def test_grad_accumulation_matches_full_batch():
    cfg1, model, state1, batch = _tiny_ptn_setup(accum=1)
    cfg2, _, state2, _ = _tiny_ptn_setup(accum=4)
    rng = jax.random.PRNGKey(0)
    s1, m1 = make_train_step(model, cfg1)(state1, batch, rng)
    s2, m2 = make_train_step(model, cfg2)(state2, batch, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    a = jax.tree_util.tree_leaves(s1.params)
    b = jax.tree_util.tree_leaves(s2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1e-5)


def test_bn_model_state_updates():
    cfg = Config(model="basicmlp", batch_size=4, input_shape=32,
                 precision="f32", opt="adam", learning_rate=1e-3)
    model = BasicMLP(input_shape=32, bottle_neck=16, n_classes=10)
    rng = np.random.default_rng(1)
    batch = {"experts": rng.standard_normal((4, 32), dtype=np.float32),
             "label": rng.integers(0, 10, (4,))}
    variables = dict(model.init(RNGS, jnp.asarray(batch["experts"])))
    params = variables.pop("params")
    tx = build_optimizer(cfg)
    state = TrainState.create(params, tx, model_state=variables)
    step = make_train_step(model, cfg)
    # the train step donates the state — snapshot to host first
    before = np.asarray(state.model_state["batch_stats"]["bn"]["mean"])
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    after = state.model_state["batch_stats"]["bn"]["mean"]
    assert not np.allclose(before, after)


def test_partition_specs_shard_transformer_kernels():
    _, model, state, _ = _tiny_ptn_setup()
    specs = param_partition_specs(state.params)
    enc0 = specs["encoder_0"]["layer_0"]
    assert enc0["self_attn"]["in_proj"]["kernel"] == \
        jax.sharding.PartitionSpec(None, "model")
    assert enc0["self_attn"]["out_proj"]["kernel"] == \
        jax.sharding.PartitionSpec("model", None)
    assert enc0["linear1"]["kernel"] == \
        jax.sharding.PartitionSpec(None, "model")
    # norms replicated
    assert specs["norm"]["scale"] == jax.sharding.PartitionSpec()


def test_train_step_on_dp_mp_mesh():
    """4-way data × 2-way tensor parallel on the virtual CPU mesh."""
    assert len(jax.devices()) == 8
    cfg, model, state, batch = _tiny_ptn_setup(batch=8)
    mesh = make_mesh(dp=4, mp=2)
    placed_vars = shard_variables({"params": state.params}, mesh)
    state = state.replace(params=placed_vars["params"])
    placed_batch = shard_batch(batch, mesh)

    step = make_train_step(model, cfg)
    state, metrics = step(state, placed_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # tensor-sharded kernel actually lives sharded over the model axis
    kern = state.params["encoder_0"]["layer_0"]["self_attn"]["in_proj"]["kernel"]
    assert len(kern.sharding.device_set) >= 2

    # sharded result equals single-device result
    cfg2, model2, state2, _ = _tiny_ptn_setup(batch=8)
    step2 = make_train_step(model2, cfg2)
    _, metrics2 = step2(state2, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics2["loss"]), rtol=1e-5)


def test_contrastive_loss_is_global_under_dp_sharding():
    """The SimCLR negatives pool must span the global batch when the batch
    is sharded over the data axis (the NT_Xent world_size semantics)."""
    from devt_tpu.models.contrastive import ContrastiveEncoder

    cfg = Config(model="contrastive", batch_size=8, input_shape=16,
                 hidden_layer=8, projection_size=8, output_shape=4,
                 precision="f32", opt="adam")
    model = ContrastiveEncoder(input_shape=16, hidden_layer=8,
                               projection_size=8, output_shape=4)
    rng = np.random.default_rng(2)
    batch = {"x_i": rng.standard_normal((8, 16), dtype=np.float32),
             "x_j": rng.standard_normal((8, 16), dtype=np.float32),
             "label": np.zeros((8, 1), np.float32)}
    variables = dict(model.init(RNGS, jnp.asarray(batch["x_i"]), train=False))
    params = variables.pop("params")
    loss_single, _, _ = forward_and_loss(
        model, cfg, {"params": params, **variables}, batch, None, False)

    mesh = make_mesh(dp=8, mp=1)
    placed = shard_batch(batch, mesh)

    @jax.jit
    def sharded_loss(params, batch):
        loss, _, _ = forward_and_loss(
            model, cfg, {"params": params, **variables}, batch, None, False)
        return loss

    loss_dp = sharded_loss(params, placed)
    np.testing.assert_allclose(float(loss_dp), float(loss_single), rtol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    cfg, model, state, batch = _tiny_ptn_setup()
    from devt_tpu.train import checkpoint as ckpt
    step = make_train_step(model, cfg)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    path = ckpt.save(str(tmp_path / "ckpts"), state, cfg)

    _, _, fresh, _ = _tiny_ptn_setup()
    restored = ckpt.restore(path, fresh)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt.latest_checkpoint(str(tmp_path / "ckpts")) == path


def test_async_save_resume_equivalence(tmp_path):
    """Preemption safety: N continuous train steps == N/2 steps +
    AsyncSaver save (overlapped write) + restore + N/2 steps.  Exercises
    the async checkpointer's staging semantics: the state snapshot must
    be complete at save() even though the write finishes later."""
    from devt_tpu.train import checkpoint as ckpt
    cfg, model, state_a, batch = _tiny_ptn_setup()
    step = make_train_step(model, cfg)

    rngs = [jax.random.PRNGKey(i) for i in range(6)]
    for r in rngs:
        state_a, _ = step(state_a, batch, r)

    _, _, state_b, _ = _tiny_ptn_setup()
    with ckpt.AsyncSaver() as saver:
        for r in rngs[:3]:
            state_b, _ = step(state_b, batch, r)
        path = saver.save(str(tmp_path / "ck"), state_b, cfg)
        # keep training while the write streams (the overlap being tested)
        for r in rngs[3:]:
            state_b, _ = step(state_b, batch, r)
    _, _, fresh, _ = _tiny_ptn_setup()
    restored = ckpt.restore(path, fresh)
    assert int(restored.step) == 3
    for r in rngs[3:]:
        restored, _ = step(restored, batch, r)

    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_main_entry_end_to_end(tmp_path, monkeypatch):
    """python -m devt_tpu.main on the synthetic dataset: fit + test with
    the TransformerEval callback producing the F1 sweep."""
    monkeypatch.chdir(tmp_path)
    from devt_tpu import main as entry
    results = entry.main([
        "--model", "ptn", "--data_set", "synthetic", "--epochs", "1",
        "--batch_size", "2", "--seq_len", "3", "--nlayers", "1",
        "--input_dimension", "32", "--nhid", "32", "--nhead", "2",
        "--n_classes", "15", "--precision", "f32", "--max_steps", "4",
        "--attention_impl", "xla", "--dropout", "0.0",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    assert "test/loss" in results
    assert os.path.exists(tmp_path / "ckpt" / "config.yaml")


def test_multi_step_matches_separate_steps():
    """make_multi_step (scan of K full train steps in one XLA program) is
    bit-equivalent to K separate make_train_step calls."""
    from devt_tpu.parallel.train_step import make_multi_step

    cfg, model, state1, _ = _tiny_ptn_setup()
    _, _, state2, _ = _tiny_ptn_setup()
    rng = np.random.default_rng(7)
    K = 3
    batches = {
        "experts": rng.standard_normal((K, 8, 4, 2, 64), dtype=np.float32),
        "label": (rng.random((K, 8, 15)) < 0.3).astype(np.float32),
    }
    key = jax.random.PRNGKey(2)
    step = make_train_step(model, cfg)
    for i in range(K):
        state1, m1 = step(state1, {k: v[i] for k, v in batches.items()}, key)
    multi = make_multi_step(model, cfg, K)
    state2, m2 = multi(state2, batches, key)
    assert int(state2.step) == K
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(float(m2["loss"]))


def test_main_resume_continues_from_checkpoint(tmp_path, monkeypatch):
    """--resume through the CLI: a second run restores the saved step and
    continues counting from it (not from zero)."""
    monkeypatch.chdir(tmp_path)
    from devt_tpu import main as entry
    from devt_tpu.train import checkpoint as ckpt

    args = ["--model", "ptn", "--data_set", "synthetic", "--epochs", "1",
            "--batch_size", "2", "--seq_len", "3", "--nlayers", "1",
            "--input_dimension", "32", "--nhid", "32", "--nhead", "2",
            "--n_classes", "15", "--precision", "f32", "--max_steps", "4",
            "--attention_impl", "xla", "--dropout", "0.0",
            "--log_every", "2",
            "--checkpoint_dir", str(tmp_path / "ck")]
    entry.main(args)
    first = ckpt.latest_checkpoint(str(tmp_path / "ck"))
    assert first and first.endswith("step_4")

    args2 = [a if a != "4" else "8" for a in args] + ["--resume", first]
    entry.main(args2)
    assert ckpt.latest_checkpoint(
        str(tmp_path / "ck")).endswith("step_8")


def test_vivit_train_step_on_dp_mp_mesh():
    """ViT-family naming (to_qkv/to_out/fc1/fc2) through the Megatron
    rules on a DP4xTP2 mesh: the mesh path uses the GSPMD-shardable
    unfused blocks (the Pallas auto-gate), kernels actually shard, and
    the loss matches single-device."""
    from devt_tpu.models.vivit import ViViT

    assert len(jax.devices()) == 8
    cfg = Config(model="vivit", batch_size=8, frame_len=2, n_classes=7,
                 precision="f32", opt="adamW", learning_rate=1e-3,
                 attention_impl="auto", dropout=0.0)
    model = ViViT(image_size=32, patch_size=16, num_classes=7,
                  num_frames=2, dim=32, depth=1, heads=2, dim_head=16,
                  channels_last=True)
    rng = np.random.default_rng(3)
    batch = {"vid": rng.standard_normal((8, 2, 32, 32, 3),
                                        dtype=np.float32),
             "label": (rng.random((8, 7)) < 0.3).astype(np.float32)}
    variables = model.init(RNGS, jnp.asarray(batch["vid"]))

    def fresh_state():   # the train step donates its input state
        params = jax.tree_util.tree_map(jnp.array, variables["params"])
        return TrainState.create(params, build_optimizer(cfg))

    state = fresh_state()
    specs = param_partition_specs(state.params)
    flat = jax.tree_util.tree_leaves_with_path(specs)
    spec_by_path = {"/".join(str(getattr(k, "key", k)) for k in p): s
                    for p, s in flat}
    qkv_specs = [s for n, s in spec_by_path.items()
                 if "to_qkv" in n and "kernel" in n]
    fc1_specs = [s for n, s in spec_by_path.items()
                 if "fc1" in n and "kernel" in n]
    assert qkv_specs and all(
        s == jax.sharding.PartitionSpec(None, "model") for s in qkv_specs)
    assert fc1_specs and all(
        s == jax.sharding.PartitionSpec(None, "model") for s in fc1_specs)

    mesh = make_mesh(dp=4, mp=2)
    placed = shard_variables({"params": state.params}, mesh)
    state_m = state.replace(params=placed["params"])
    step = make_train_step(model, cfg)
    state_m, metrics = step(state_m, shard_batch(batch, mesh),
                            jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    kern = [v for p, v in jax.tree_util.tree_leaves_with_path(
        state_m.params)
        if any("to_qkv" in str(getattr(k, "key", k)) for k in p)][0]
    assert len(kern.sharding.device_set) >= 2

    _, metrics_s = make_train_step(model, cfg)(
        fresh_state(), batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics_s["loss"]), rtol=1e-5)
