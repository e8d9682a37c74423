"""Fused ViT block kernel vs unfused reference, fwd + full bwd (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devt_tpu.ops.fused_block import fused_vit_block, reference_vit_block


def _make(dim=32, mlp=64, heads=2, b=4, s=16, seed=0):
    rng = np.random.default_rng(seed)

    def t(*shape, scale=0.1):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    params = {
        "g1": jnp.ones((1, dim)), "b1": jnp.zeros((1, dim)),
        "wqkv": t(dim, 3 * dim), "wo": t(dim, dim), "bo": jnp.zeros((1, dim)),
        "g2": jnp.ones((1, dim)), "b2": jnp.zeros((1, dim)),
        "w1": t(dim, mlp), "bb1": t(1, mlp, scale=0.01),
        "w2": t(mlp, dim), "bb2": t(1, dim, scale=0.01),
    }
    x = t(b, s, dim, scale=1.0)
    return x, params


@pytest.mark.parametrize("kv_len", [16, 13])
def test_fused_forward_matches_reference(kv_len):
    x, params = _make()
    scale = (32 // 2) ** -0.5
    ref = reference_vit_block(x, params, 2, scale, kv_len)
    out = fused_vit_block(x, params, 2, scale, kv_len, True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-4)


def test_fused_backward_matches_reference():
    x, params = _make(seed=1)
    scale = (32 // 2) ** -0.5
    kv_len = 13

    def loss_ref(x, params):
        return jnp.sum(jnp.sin(
            reference_vit_block(x, params, 2, scale, kv_len)))

    def loss_fused(x, params):
        return jnp.sum(jnp.sin(
            fused_vit_block(x, params, 2, scale, kv_len, True)))

    (dx_r, dp_r) = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    (dx_f, dp_f) = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(dx_f, dx_r, atol=5e-5, rtol=5e-4)
    for k in dp_r:
        np.testing.assert_allclose(
            np.asarray(dp_f[k]).reshape(np.asarray(dp_r[k]).shape),
            dp_r[k], atol=5e-5, rtol=5e-4, err_msg=k)


def test_fused_grad_accumulates_across_grid():
    """Param grads must sum over ALL grid steps (the constant-index
    accumulation pattern): doubling the batch doubles dW."""
    x, params = _make(b=4, seed=2)
    scale = (32 // 2) ** -0.5

    def dw(xin):
        return jax.grad(lambda p: jnp.sum(
            fused_vit_block(xin, p, 2, scale, 16, True)))(params)["wqkv"]

    x2 = jnp.concatenate([x, x], axis=0)
    np.testing.assert_allclose(np.asarray(dw(x2)), 2 * np.asarray(dw(x)),
                               atol=1e-4, rtol=1e-4)
