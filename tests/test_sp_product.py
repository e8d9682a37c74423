"""Sequence-parallel product surface: config.sp trains ViViT with the
space transformer's token axis sharded over a "seq" mesh axis and
attention running the kv ring (parallel/ring_attention.py).

The library-level ring block already has fwd/grad parity tests
(tests/test_ring_attention.py); these pin the TRAINER composition — the
(data, seq) mesh, the sp_shard_map strategy, the uniform seq-axis grad
pmean (exact because the closing all_gather's psum_scatter transpose
carries the n× factor), and the stacked pb_* layout shared with pp —
to the single-device twin.  No reference analogue: its sequences are
tiny (src/config.yaml:3-4); this is long-context scaling headroom.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devt_tpu.parallel.ring_attention import SEQ_AXIS


def _tiny_sp_vivit(sp=4):
    from devt_tpu.config import Config
    from devt_tpu.models.vivit import ViViT
    from devt_tpu.train.optimizers import build_optimizer
    from devt_tpu.train.state import TrainState

    # image 32 / patch 16 → 5 tokens, padded to 16 — divisible by sp=4
    cfg = Config(model="vivit", batch_size=8, frame_len=2, n_classes=5,
                 opt="adamW", learning_rate=1e-3, precision="f32",
                 dropout=0.0, attention_impl="xla", sp=sp)
    model = ViViT(image_size=32, patch_size=16, num_classes=5,
                  num_frames=2, dim=32, depth=4, heads=2, dim_head=16,
                  scale_dim=2, channels_last=True, attention_impl="xla",
                  sequence_parallel=True)
    rng = np.random.default_rng(13)
    batch = {"vid": rng.standard_normal((8, 2, 32, 32, 3),
                                        dtype=np.float32),
             "label": (rng.random((8, 5)) < 0.3).astype(np.float32)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, jnp.asarray(batch["vid"]))

    def fresh_state():
        params = jax.tree_util.tree_map(jnp.array, variables["params"])
        return TrainState.create(params, build_optimizer(cfg))

    return cfg, model, fresh_state, batch


def _mesh_sp(cfg):
    from devt_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    return make_mesh(cfg.dp, cfg.mp, cfg.pp, cfg.sp)


def test_sp_config_and_mesh():
    from devt_tpu.config import Config
    from devt_tpu.parallel.mesh import make_mesh
    from devt_tpu.parallel.train_step import mesh_strategy

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    cfg = Config(model="vivit", dropout=0.0, sp=4)
    mesh = make_mesh(cfg.dp, cfg.mp, cfg.pp, cfg.sp)
    assert dict(mesh.shape) == {"data": 2, SEQ_AXIS: 4}
    assert mesh_strategy(mesh, cfg) == "sp_shard_map"

    with pytest.raises(ValueError, match="dp only"):
        Config(model="vivit", dropout=0.0, sp=2, mp=2)
    with pytest.raises(ValueError, match="dp only"):
        Config(model="vivit", dropout=0.0, sp=2, pp=2)
    with pytest.raises(ValueError, match="vivit"):
        Config(model="ptn", dropout=0.0, sp=2)
    with pytest.raises(ValueError, match="dropout"):
        Config(model="vivit", dropout=0.1, sp=2)
    with pytest.raises(ValueError, match="MoE"):
        Config(model="vivit", dropout=0.0, sp=2, moe_experts=4)


def test_sp_registry_builds_stacked_vivit():
    """config.sp > 1 reaches the model: the space transformer declares
    the stacked pb_* layout (the same tree as config.pp — checkpoints
    are interchangeable between sp and pp runs)."""
    from devt_tpu.config import Config
    from devt_tpu.registry import build_model

    cfg = Config(model="vivit", dropout=0.0, sp=2, frame_len=2,
                 n_classes=5, precision="f32")
    model = build_model(cfg)
    assert model.sequence_parallel
    x = jnp.zeros((1, 2, 224, 224, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    space = params["space_transformer"]
    assert "pb_wqkv" in space and space["pb_wqkv"].shape[0] == model.depth


def test_sp_trainer_and_eval_match_sequential():
    """The full (data=2, seq=4) train step tracks the single-device
    sequential twin from the same init: loss parity every step, param
    parity after 3 Adam steps (the uniform seq-axis pmean is exact),
    and eval loss/probs match."""
    from devt_tpu.parallel.mesh import shard_batch
    from devt_tpu.parallel.train_step import (make_eval_step,
                                              make_train_step,
                                              mesh_strategy)

    cfg, model, fresh_state, batch = _tiny_sp_vivit()
    mesh = _mesh_sp(cfg)
    assert mesh_strategy(mesh, cfg) == "sp_shard_map"

    step_sp = make_train_step(model, cfg, mesh)
    step_sq = make_train_step(model, cfg)
    st_sp, st_sq = fresh_state(), fresh_state()
    for i in range(3):
        key = jax.random.PRNGKey(17 + i)
        st_sp, m_sp = step_sp(st_sp, shard_batch(batch, mesh), key)
        st_sq, m_sq = step_sq(st_sq, batch, key)
        np.testing.assert_allclose(float(m_sp["loss"]),
                                   float(m_sq["loss"]), rtol=1e-4)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(st_sp.params),
            jax.tree_util.tree_leaves_with_path(st_sq.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(ka))

    loss_m, aux_m = make_eval_step(model, cfg, mesh)(
        st_sp, shard_batch(batch, mesh))
    loss_s, aux_s = make_eval_step(model, cfg)(st_sq, batch)
    np.testing.assert_allclose(float(loss_m), float(loss_s), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(aux_m["probs"]),
                               np.asarray(aux_s["probs"]),
                               atol=1e-3, rtol=1e-2)


def test_sp_multi_step_matches_separate_steps():
    from devt_tpu.parallel.mesh import shard_batch
    from devt_tpu.parallel.train_step import (make_multi_step,
                                              make_train_step)

    cfg, model, fresh_state, batch = _tiny_sp_vivit()
    mesh = _mesh_sp(cfg)
    key = jax.random.PRNGKey(23)

    st_a = fresh_state()
    step = make_train_step(model, cfg, mesh)
    for _ in range(2):
        st_a, _ = step(st_a, shard_batch(batch, mesh), key)

    st_b = fresh_state()
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.stack([jnp.asarray(x)] * 2), batch)
    st_b, metrics = make_multi_step(model, cfg, 2, mesh)(
        st_b, shard_batch(stacked, mesh), key)
    assert np.isfinite(float(metrics["loss"]))
    for a, b in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_main_entry_vivit_sp(tmp_path, monkeypatch):
    """The config-driven SP surface end to end: --sp 4 through main()
    builds the (data, seq) mesh and trains the default ViViT (224px →
    197 tokens padded to 208 = 4 × 52) through the sp_shard_map
    strategy to finite losses."""
    monkeypatch.chdir(tmp_path)
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    from devt_tpu import main as entry

    results = entry.main([
        "--model", "vivit", "--data_set", "synthetic", "--epochs", "1",
        "--batch_size", "4", "--frame_len", "2", "--n_classes", "7",
        "--precision", "f32", "--max_steps", "2",
        "--attention_impl", "xla", "--dropout", "0.0",
        "--dp", "2", "--sp", "4",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    assert "test/loss" in results and np.isfinite(results["test/loss"])
