"""3-D parallelism: DP x PP x TP in one train step.

config.pp > 1 with mp > 1 builds the (data, pipe, model) mesh
(parallel/mesh.make_mesh); the pp_shard_map strategy runs the GPipe
schedule over ``pipe`` while every stage executes as the Megatron TP
block over ``model`` with the fused Pallas MHA per device
(models/layers.ViTTransformer._tp_stage_fn).  The reference trains on a
single GPU (src/main.py:87-88) — this is beyond-parity scaling surface;
these tests pin the whole composition to the single-device twin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devt_tpu.parallel.pipeline import PIPE_AXIS


def _tiny_3d_vivit(pp=2, mp=2, depth=4):
    from devt_tpu.config import Config
    from devt_tpu.models.vivit import ViViT
    from devt_tpu.train.optimizers import build_optimizer
    from devt_tpu.train.state import TrainState

    # heads=2 divides mp=2; dim == heads*dim_head and mlp % mp == 0 —
    # the Megatron eligibility the stage body asserts
    # config impl stays "auto" (the TPU product value); the MODEL is
    # pinned to fused_interpret so the Pallas kernels run on this CPU
    # mesh — same convention as the tp_block and fused-kernel DP tests
    cfg = Config(model="vivit", batch_size=8, frame_len=2, n_classes=5,
                 opt="adamW", learning_rate=1e-3, precision="f32",
                 dropout=0.0, pp=pp, mp=mp)
    model = ViViT(image_size=32, patch_size=16, num_classes=5,
                  num_frames=2, dim=32, depth=depth, heads=2, dim_head=16,
                  scale_dim=2, channels_last=True,
                  attention_impl="fused_interpret", pipeline_stages=pp)
    rng = np.random.default_rng(7)
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


def _mesh_3d(cfg):
    from devt_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    return make_mesh(cfg.dp, cfg.mp, cfg.pp)


def test_3d_mesh_axes_and_strategy():
    from devt_tpu.config import Config
    from devt_tpu.parallel.mesh import make_mesh
    from devt_tpu.parallel.train_step import mesh_strategy

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    cfg = Config(model="vivit", dropout=0.0, pp=2, mp=2)
    mesh = make_mesh(cfg.dp, cfg.mp, cfg.pp)
    # model innermost: the per-block TP psums ride the fastest-varying
    # (physically adjacent) devices
    assert dict(mesh.shape) == {"data": 2, PIPE_AXIS: 2, "model": 2}
    assert tuple(mesh.axis_names) == ("data", PIPE_AXIS, "model")
    assert mesh_strategy(mesh, cfg) == "pp_shard_map"


def test_3d_tp_stage_rejects_indivisible_heads():
    """The Megatron stage asserts head/FFN divisibility at trace time
    rather than silently mis-sharding."""
    from devt_tpu.models.vivit import ViViT
    from devt_tpu.parallel.train_step import make_train_step
    from devt_tpu.train.optimizers import build_optimizer
    from devt_tpu.train.state import TrainState

    cfg, _, _, batch = _tiny_3d_vivit()
    mesh = _mesh_3d(cfg)
    # 3 heads % mp=2 != 0 — everything else eligible
    bad = ViViT(image_size=32, patch_size=16, num_classes=5, num_frames=2,
                dim=24, depth=4, heads=3, dim_head=8, scale_dim=2,
                channels_last=True, attention_impl="fused_interpret",
                pipeline_stages=2)
    variables = bad.init({"params": jax.random.PRNGKey(0)},
                         jnp.asarray(batch["vid"]))
    state = TrainState.create(variables["params"], build_optimizer(cfg))
    step = make_train_step(bad, cfg, mesh)
    with pytest.raises(ValueError, match="heads"):
        step(state, batch, jax.random.PRNGKey(0))


def test_3d_trainer_and_eval_match_sequential():
    """The full dp2 x pp2 x tp2 train step tracks the single-device
    sequential twin from the same init: loss parity every step, param
    parity after 3 Adam steps (the model-axis psum/pmean grad reassembly
    is exact), and the eval step returns the same loss/probs."""
    from devt_tpu.parallel.mesh import shard_batch
    from devt_tpu.parallel.train_step import (make_eval_step,
                                              make_train_step,
                                              mesh_strategy)

    cfg, model, fresh_state, batch = _tiny_3d_vivit()
    mesh = _mesh_3d(cfg)
    assert mesh_strategy(mesh, cfg) == "pp_shard_map"

    step_3d = make_train_step(model, cfg, mesh)
    step_sq = make_train_step(model, cfg)
    st_3d, st_sq = fresh_state(), fresh_state()
    for i in range(3):
        key = jax.random.PRNGKey(3 + i)
        st_3d, m_3d = step_3d(st_3d, shard_batch(batch, mesh), key)
        st_sq, m_sq = step_sq(st_sq, batch, key)
        np.testing.assert_allclose(float(m_3d["loss"]),
                                   float(m_sq["loss"]), rtol=1e-4)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(st_3d.params),
            jax.tree_util.tree_leaves_with_path(st_sq.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(ka))

    loss_m, aux_m = make_eval_step(model, cfg, mesh)(
        st_3d, shard_batch(batch, mesh))
    loss_s, aux_s = make_eval_step(model, cfg)(st_sq, batch)
    np.testing.assert_allclose(float(loss_m), float(loss_s), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(aux_m["probs"]),
                               np.asarray(aux_s["probs"]),
                               atol=1e-3, rtol=1e-2)


def test_3d_multi_step_matches_separate_steps():
    """make_multi_step on the 3-D mesh: 2 scanned steps == 2 separate
    3-D steps (same rng schedule)."""
    from devt_tpu.parallel.mesh import shard_batch
    from devt_tpu.parallel.train_step import (make_multi_step,
                                              make_train_step)

    cfg, model, fresh_state, batch = _tiny_3d_vivit()
    mesh = _mesh_3d(cfg)
    key = jax.random.PRNGKey(9)

    st_a = fresh_state()
    sharded = shard_batch(batch, mesh)
    step = make_train_step(model, cfg, mesh)
    for _ in range(2):
        st_a, _ = step(st_a, sharded, key)

    st_b = fresh_state()
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.stack([jnp.asarray(x)] * 2), batch)
    multi = make_multi_step(model, cfg, 2, mesh)
    st_b, metrics = multi(st_b, shard_batch(stacked, mesh), key)
    assert np.isfinite(float(metrics["loss"]))
    for a, b in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_main_entry_vivit_3d(tmp_path, monkeypatch):
    """The config-driven 3-D surface end to end: --pp 2 --mp 3 through
    main() builds the (data=1, pipe=2, model=3) mesh (the flagship's 3
    heads TP-split 3-way), trains the stacked-stage ViViT with every
    stage as the Megatron TP block (interpret-mode fused kernels on this
    CPU mesh), evaluates, and reports finite losses."""
    monkeypatch.chdir(tmp_path)
    if len(jax.devices()) < 6:
        pytest.skip("needs >= 6 virtual devices")
    from devt_tpu import main as entry

    results = entry.main([
        "--model", "vivit", "--data_set", "synthetic", "--epochs", "1",
        "--batch_size", "4", "--frame_len", "2", "--n_classes", "7",
        "--precision", "f32", "--max_steps", "2",
        "--attention_impl", "fused_interpret", "--dropout", "0.0",
        "--dp", "1", "--pp", "2", "--mp", "3",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    assert "test/loss" in results and np.isfinite(results["test/loss"])


def test_state_places_replicated_on_3d_mesh():
    """shard_train_state on the (data, pipe, model) mesh: the pp_shard_map
    step takes state replicated and carves TP shards inside the body, so
    Megatron placement would make jit reshard the tree every step —
    every leaf must land fully replicated."""
    from devt_tpu.parallel import sharding

    cfg, model, fresh_state, batch = _tiny_3d_vivit()
    mesh = _mesh_3d(cfg)
    placed = sharding.shard_train_state(fresh_state(), mesh)
    for leaf in jax.tree_util.tree_leaves(placed):
        if hasattr(leaf, "sharding"):
            assert leaf.sharding.is_fully_replicated
