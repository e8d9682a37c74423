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
