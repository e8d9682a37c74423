"""Megatron-TP ViT block (parallel/tp_block.py): per-device fused Pallas
attention under shard_map vs the single-device reference block."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from devt_tpu.ops.fused_block import reference_vit_block
from devt_tpu.parallel.tp_block import (tp_shard_block_params,
                                        tp_unshard_block_params,
                                        tp_vit_block,
                                        tp_vit_block_sharded)

DIM, MLP, HEADS, B, S = 64, 128, 8, 2, 16
SCALE = (DIM // HEADS) ** -0.5


def _make(seed=0):
    rng = np.random.default_rng(seed)

    def t(*shape, scale=0.1):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    params = {
        "g1": jnp.ones((1, DIM)), "b1": jnp.zeros((1, DIM)),
        "wqkv": t(DIM, 3 * DIM), "wo": t(DIM, DIM),
        "bo": t(1, DIM, scale=0.01),
        "g2": jnp.ones((1, DIM)), "b2": jnp.zeros((1, DIM)),
        "w1": t(DIM, MLP), "bb1": t(1, MLP, scale=0.01),
        "w2": t(MLP, DIM), "bb2": t(1, DIM, scale=0.01),
    }
    return t(B, S, DIM, scale=1.0), params


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    return Mesh(np.asarray(devs[:8]), ("model",))


def test_shard_roundtrip():
    _, params = _make()
    rep, shard = tp_shard_block_params(params, 8)
    # physical per-device shapes: heads and FFN hidden split 8-way
    assert shard["wqkv"].shape == (8, DIM, 3 * DIM // 8)
    assert shard["wo"].shape == (8, DIM // 8, DIM)
    assert shard["w1"].shape == (8, DIM, MLP // 8)
    assert shard["w2"].shape == (8, MLP // 8, DIM)
    back = tp_unshard_block_params(rep, shard)
    for k, v in params.items():
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(v), k)


@pytest.mark.parametrize("kv_len", [S, 13])
def test_tp_forward_matches_reference(kv_len):
    x, params = _make()
    mesh = _mesh()
    ref = reference_vit_block(x, params, HEADS, SCALE, kv_len)
    out = tp_vit_block(x, params, mesh, heads=HEADS, scale=SCALE,
                       kv_len=kv_len, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_tp_backward_matches_reference():
    """Grads through shard_map + the Pallas custom VJP, mapped back to
    the full layout, must equal the single-device block's grads — the
    Megatron psum/identity transpose story end to end."""
    x, params = _make(seed=1)
    mesh = _mesh()
    kv_len = 13
    rep, shard = tp_shard_block_params(params, 8)

    def loss_ref(x, p):
        return jnp.sum(jnp.sin(
            reference_vit_block(x, p, HEADS, SCALE, kv_len)))

    def loss_tp(x, rep, shard):
        return jnp.sum(jnp.sin(tp_vit_block_sharded(
            x, rep, shard, mesh, heads=HEADS, scale=SCALE,
            kv_len=kv_len, interpret=True)))

    dx_r, dp_r = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    dx_t, drep, dshard = jax.grad(loss_tp, argnums=(0, 1, 2))(
        x, rep, shard)
    dp_t = tp_unshard_block_params(drep, dshard)
    np.testing.assert_allclose(np.asarray(dx_t), np.asarray(dx_r),
                               atol=5e-5, rtol=5e-4)
    for k in dp_r:
        np.testing.assert_allclose(
            np.asarray(dp_t[k]).reshape(np.asarray(dp_r[k]).shape),
            np.asarray(dp_r[k]), atol=5e-5, rtol=5e-4, err_msg=k)


def test_tp_train_steps_stay_sharded():
    """A small SGD loop on the sharded layout: params update in place
    (stacked shards never gathered) and the loss goes down."""
    x, params = _make(seed=2)
    mesh = _mesh()
    rep, shard = tp_shard_block_params(params, 8)
    target = jnp.zeros((B, S, DIM), jnp.float32)

    @jax.jit
    def step(rep, shard):
        def loss_fn(rep, shard):
            y = tp_vit_block_sharded(x, rep, shard, mesh, heads=HEADS,
                                     interpret=True)
            return jnp.mean((y - target) ** 2)

        loss, (gr, gs) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            rep, shard)
        upd = lambda p, g: jax.tree_util.tree_map(
            lambda a, b: a - 0.05 * b, p, g)
        return upd(rep, gr), upd(shard, gs), loss

    losses = []
    for _ in range(5):
        rep, shard, loss = step(rep, shard)
        losses.append(float(loss))
    # y ≈ x + f(x) with target 0: the residual term bounds how fast MSE
    # can fall — assert steady optimisation, not a collapse
    assert all(b < a for a, b in zip(losses, losses[1:])), losses
    assert losses[-1] < losses[0] * 0.97, losses
    assert shard["wqkv"].shape[0] == 8  # still the stacked TP layout


def test_dp_tp_composition_matches_reference():
    """(data=2, model=4) mesh: batch shards over data, heads/FFN over
    model; fwd output and ALL grads equal the single-device block on the
    full batch (the data-axis psum in the shard_map transpose + the
    model-axis psums compose exactly)."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    x, params = _make(seed=3)
    mesh = Mesh(np.asarray(devs[:8]).reshape(2, 4), ("data", "model"))
    rep, shard = tp_shard_block_params(params, 4)
    kv_len = 13

    def loss_ref(x, p):
        return jnp.sum(jnp.sin(
            reference_vit_block(x, p, HEADS, SCALE, kv_len)))

    def loss_tp(x, rep, shard):
        return jnp.sum(jnp.sin(tp_vit_block_sharded(
            x, rep, shard, mesh, heads=HEADS, scale=SCALE, kv_len=kv_len,
            batch_axis="data", interpret=True)))

    out = tp_vit_block_sharded(x, rep, shard, mesh, heads=HEADS,
                               scale=SCALE, kv_len=kv_len,
                               batch_axis="data", interpret=True)
    ref = reference_vit_block(x, params, HEADS, SCALE, kv_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)

    dx_r, dp_r = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    dx_t, drep, dshard = jax.grad(loss_tp, argnums=(0, 1, 2))(
        x, rep, shard)
    dp_t = tp_unshard_block_params(drep, dshard)
    np.testing.assert_allclose(np.asarray(dx_t), np.asarray(dx_r),
                               atol=5e-5, rtol=5e-4)
    for k in dp_r:
        np.testing.assert_allclose(
            np.asarray(dp_t[k]).reshape(np.asarray(dp_r[k]).shape),
            np.asarray(dp_r[k]), atol=5e-5, rtol=5e-4, err_msg=k)


def test_trainer_tp_mesh_routes_vit_blocks_through_pallas_tp(monkeypatch):
    """The PRODUCT path: make_train_step on a DP4xTP2 mesh traces ViViT's
    ViT blocks through the Megatron shard_map block (fused Pallas MHA per
    device) instead of the jnp fallback — and the loss still matches the
    single-device step."""
    from devt_tpu.config import Config
    from devt_tpu.models.vivit import ViViT
    from devt_tpu.parallel import tp_block
    from devt_tpu.parallel.mesh import make_mesh, shard_batch
    from devt_tpu.parallel.sharding import shard_variables
    from devt_tpu.parallel.train_step import make_train_step, mesh_strategy
    from devt_tpu.train.optimizers import build_optimizer
    from devt_tpu.train.state import TrainState

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the virtual 8-device mesh")

    calls = []
    real = tp_block.tp_vit_block

    def spy(*a, **kw):
        calls.append(kw.get("batch_axis", None))
        return real(*a, **kw)

    monkeypatch.setattr(tp_block, "tp_vit_block", spy)

    cfg = Config(model="vivit", batch_size=8, frame_len=2, n_classes=7,
                 precision="f32", opt="adamW", learning_rate=1e-3,
                 attention_impl="auto", dropout=0.0)
    model = ViViT(image_size=32, patch_size=16, num_classes=7,
                  num_frames=2, dim=32, depth=1, heads=2, dim_head=16,
                  channels_last=True)
    rng = np.random.default_rng(4)
    batch = {"vid": rng.standard_normal((8, 2, 32, 32, 3),
                                        dtype=np.float32),
             "label": (rng.random((8, 7)) < 0.3).astype(np.float32)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(batch["vid"]))

    def fresh_state():
        params = jax.tree_util.tree_map(jnp.array, variables["params"])
        return TrainState.create(params, build_optimizer(cfg))

    mesh = make_mesh(dp=4, mp=2)
    assert mesh_strategy(mesh, cfg) == "gspmd"
    placed = shard_variables({"params": fresh_state().params}, mesh)
    state_m = fresh_state().replace(params=placed["params"])
    step = make_train_step(model, cfg, mesh=mesh)
    state_m, metrics = step(state_m, shard_batch(batch, mesh),
                            jax.random.PRNGKey(2))
    # the space transformer (the hot path) routes through the TP block;
    # the temporal transformer keeps its deliberate xla default (round-2
    # measurement: Pallas is perf-neutral there) and shards via GSPMD
    assert calls == ["data"], calls

    _, metrics_s = make_train_step(model, cfg)(
        fresh_state(), batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics_s["loss"]), rtol=2e-5)


def test_trainer_tp_routes_flagship_width_mp3(monkeypatch):
    """The flagship ViViT head layout (3 heads of 64) TP-routes at mp=3 —
    the natural TP width for d=192 — on a (dp=2, mp=3) 6-device mesh."""
    from devt_tpu.config import Config
    from devt_tpu.models.vivit import ViViT
    from devt_tpu.parallel import tp_block
    from devt_tpu.parallel.mesh import make_mesh, shard_batch
    from devt_tpu.parallel.sharding import shard_variables
    from devt_tpu.parallel.train_step import make_train_step
    from devt_tpu.train.optimizers import build_optimizer
    from devt_tpu.train.state import TrainState

    devs = jax.devices()
    if len(devs) < 6:
        pytest.skip("needs >= 6 virtual devices")

    calls = []
    real = tp_block.tp_vit_block

    def spy(*a, **kw):
        calls.append(a[2].shape["model"])
        return real(*a, **kw)

    monkeypatch.setattr(tp_block, "tp_vit_block", spy)

    cfg = Config(model="vivit", batch_size=6, frame_len=2, n_classes=5,
                 precision="f32", opt="adamW", learning_rate=1e-3,
                 attention_impl="auto", dropout=0.0)
    model = ViViT(image_size=64, patch_size=16, num_classes=5,
                  num_frames=2, dim=192, depth=1, heads=3, dim_head=64,
                  channels_last=True)
    rng = np.random.default_rng(6)
    batch = {"vid": rng.standard_normal((6, 2, 64, 64, 3),
                                        dtype=np.float32),
             "label": (rng.random((6, 5)) < 0.3).astype(np.float32)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(batch["vid"]))
    state = TrainState.create(variables["params"], build_optimizer(cfg))
    mesh = make_mesh(dp=2, mp=3, devices=devs[:6])
    placed = shard_variables({"params": state.params}, mesh)
    state = state.replace(params=placed["params"])
    step = make_train_step(model, cfg, mesh=mesh)
    state, metrics = step(state, shard_batch(batch, mesh),
                          jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert calls == [3], calls  # one space block, split 3-way


def test_tp_block_dropout_semantics():
    """Training dropout in the TP body: rate 0 ≡ deterministic; masks
    vary with the rng; the mean over many draws recovers the
    deterministic output (the three reference sites are unbiased)."""
    x, params = _make(seed=9)
    mesh = _mesh()
    det = tp_vit_block(x, params, mesh, heads=HEADS, interpret=True)
    zero = tp_vit_block(x, params, mesh, heads=HEADS, dropout_rate=0.0,
                        interpret=True)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(zero))

    k = jax.random.PRNGKey(0)
    d1 = tp_vit_block(x, params, mesh, heads=HEADS, dropout_rate=0.4,
                      dropout_rng=k, interpret=True)
    d2 = tp_vit_block(x, params, mesh, heads=HEADS, dropout_rate=0.4,
                      dropout_rng=jax.random.PRNGKey(1), interpret=True)
    assert not np.allclose(np.asarray(d1), np.asarray(d2))
    assert not np.allclose(np.asarray(d1), np.asarray(det))

    rep, shard = tp_shard_block_params(params, 8)

    @jax.jit
    def one(key):
        return tp_vit_block_sharded(x, rep, shard, mesh, heads=HEADS,
                                    dropout_rate=0.4, dropout_rng=key,
                                    interpret=True)

    acc = np.zeros_like(np.asarray(det))
    n = 192
    for i in range(n):
        acc += np.asarray(one(jax.random.PRNGKey(100 + i)))
    mean = acc / n
    # mean-field: loose tolerance, the three sites compound
    err = np.abs(mean - np.asarray(det)).mean()
    scale = np.abs(np.asarray(det)).mean()
    assert err < 0.12 * scale, (err, scale)


def test_trainer_tp_routes_dropout_training(monkeypatch):
    """Dropout-training no longer falls back: the TP block serves the
    three reference dropout sites inside the shard_map body."""
    from devt_tpu.config import Config
    from devt_tpu.models.vivit import ViViT
    from devt_tpu.parallel import tp_block
    from devt_tpu.parallel.mesh import make_mesh, shard_batch
    from devt_tpu.parallel.sharding import shard_variables
    from devt_tpu.parallel.train_step import make_train_step
    from devt_tpu.train.optimizers import build_optimizer
    from devt_tpu.train.state import TrainState

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the virtual 8-device mesh")

    rates = []
    real = tp_block.tp_vit_block
    monkeypatch.setattr(
        tp_block, "tp_vit_block",
        lambda *a, **kw: (rates.append(kw.get("dropout_rate", 0.0)),
                          real(*a, **kw))[1])

    cfg = Config(model="vivit", batch_size=8, frame_len=2, n_classes=7,
                 precision="f32", opt="adamW", learning_rate=1e-3,
                 attention_impl="auto", dropout=0.1)
    model = ViViT(image_size=32, patch_size=16, num_classes=7,
                  num_frames=2, dim=32, depth=1, heads=2, dim_head=16,
                  dropout=0.1, channels_last=True)
    rng = np.random.default_rng(8)
    batch = {"vid": rng.standard_normal((8, 2, 32, 32, 3),
                                        dtype=np.float32),
             "label": (rng.random((8, 7)) < 0.3).astype(np.float32)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(batch["vid"]))
    state = TrainState.create(variables["params"],
                              build_optimizer(cfg))
    mesh = make_mesh(dp=4, mp=2)
    placed = shard_variables({"params": state.params}, mesh)
    state = state.replace(params=placed["params"])
    step = make_train_step(model, cfg, mesh=mesh)
    state, metrics = step(state, shard_batch(batch, mesh),
                          jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert 0.1 in rates, rates  # the space block routed WITH dropout


def test_dp_tp_dropout_masks_differ_per_data_shard():
    """Under DP×TP, each data shard must draw its own dropout masks (its
    samples differ) — identical inputs in different shards must come out
    differently masked."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    x, params = _make(seed=4)
    # same sample replicated across the batch: any output difference
    # between rows proves per-shard masks
    x = jnp.broadcast_to(x[:1], x.shape)
    mesh = Mesh(np.asarray(devs[:8]).reshape(2, 4), ("data", "model"))
    out = tp_vit_block(x, params, mesh, heads=HEADS, dropout_rate=0.4,
                       dropout_rng=jax.random.PRNGKey(3),
                       batch_axis="data", interpret=True)
    out = np.asarray(out)
    assert not np.allclose(out[0], out[1])
