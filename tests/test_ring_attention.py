"""Ring/context-parallel attention parity on the virtual 8-device mesh.

Proves the SURVEY §5 design claim: the blockwise flash combine rule
extends across devices (kv rotating over the ring) with no change to the
math — outputs and gradients match single-device attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from devt_tpu.ops.attention import xla_attention
from devt_tpu.parallel.ring_attention import ring_attention


def _mesh(n=8, axis="sp"):
    return Mesh(np.array(jax.devices()[:n]), (axis,))


def test_ring_matches_single_device_forward():
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 3, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    mesh = _mesh()
    out = ring_attention(q, k, v, mesh, axis="sp")
    ref = xla_attention(q, k, v, scale=d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_ring_respects_kv_len_mask():
    rng = np.random.default_rng(1)
    b, h, s, d = 1, 2, 128, 32
    kv_len = 100                      # tail is tile padding
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    mesh = _mesh()
    out = ring_attention(q, k, v, mesh, axis="sp", kv_len=kv_len)
    ref = xla_attention(q, k, v, scale=d ** -0.5, kv_len=kv_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_ring_gradients_match_single_device():
    rng = np.random.default_rng(2)
    b, h, s, d = 1, 2, 128, 32
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    mesh = _mesh()

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh, axis="sp") * w)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, scale=d ** -0.5) * w)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=1e-4)


def test_ring_vit_block_matches_reference():
    """A WHOLE pre-norm ViT block runs sequence-parallel: fwd + grads
    match ops/fused_block.reference_vit_block, incl. kv_len masking."""
    from devt_tpu.ops.fused_block import reference_vit_block
    from devt_tpu.parallel.ring_attention import ring_vit_block

    rng = np.random.default_rng(0)
    B, S, D, H, MLP = 2, 32, 64, 2, 128
    kv_len = 29

    def P_(*sh, scale=0.1):
        return jnp.asarray(rng.standard_normal(sh) * scale, jnp.float32)

    params = {"g1": P_(1, D, scale=0.02) + 1.0, "b1": P_(1, D, scale=0.02),
              "wqkv": P_(D, 3 * D), "wo": P_(D, D), "bo": P_(1, D),
              "g2": P_(1, D, scale=0.02) + 1.0, "b2": P_(1, D, scale=0.02),
              "w1": P_(D, MLP), "bb1": P_(1, MLP),
              "w2": P_(MLP, D), "bb2": P_(1, D)}
    x = jnp.asarray(rng.standard_normal((B, S, D)) * 0.5, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
    mesh = _mesh(8, "sp")
    scale = (D // H) ** -0.5

    ref = reference_vit_block(x, params, H, scale, kv_len)
    out = jax.jit(lambda x, p: ring_vit_block(
        x, p, mesh, heads=H, kv_len=kv_len, axis="sp"))(x, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    g_ref = jax.grad(lambda x, p: jnp.sum(
        cot * reference_vit_block(x, p, H, scale, kv_len)),
        argnums=(0, 1))(x, params)
    g_ring = jax.jit(jax.grad(lambda x, p: jnp.sum(
        cot * ring_vit_block(x, p, mesh, heads=H, kv_len=kv_len,
                             axis="sp")), argnums=(0, 1)))(x, params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_ring)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-5)
