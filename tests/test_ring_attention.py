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
