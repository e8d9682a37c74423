"""Flash-attention kernel vs reference einsum attention, fwd + bwd.

The Pallas kernels run in interpreter mode on CPU; on a real TPU the same
tests compile natively (see tests/test_tpu_smoke.py which only runs when a
TPU backend is present).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devt_tpu.ops.attention import xla_attention
from devt_tpu.ops.flash_attention import flash_attention


def _rand_qkv(key, b, h, s, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), dtype)
    k = jax.random.normal(kk, (b, h, s, d), dtype)
    v = jax.random.normal(kv, (b, h, s, d), dtype)
    return q, k, v


# Shapes drawn from the reference models: 14 clip tokens / head_dim 448
# (src/frame_transformer.py:99,204), 197 ViViT patch tokens / head_dim 64
# (src/models/vit.py:80,87), 2048/8=256 head_dim PTN (src/config.yaml:21-22).
@pytest.mark.parametrize("b,h,s,d", [
    (2, 2, 14, 448),
    (1, 3, 197, 64),
    (2, 8, 14, 256),
    (1, 1, 128, 128),   # exactly tile-aligned
    (1, 2, 300, 64),    # multiple kv blocks with ragged tail
])
def test_flash_matches_xla_forward(b, h, s, d):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), b, h, s, d)
    scale = d ** -0.5
    ref = xla_attention(q, k, v, scale=scale)
    out = flash_attention(q, k, v, scale=scale, interpret=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("b,h,s,d", [
    (2, 2, 14, 64),
    (1, 2, 197, 64),
    (1, 1, 300, 128),
])
def test_flash_matches_xla_backward(b, h, s, d):
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), b, h, s, d)
    scale = d ** -0.5

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(xla_attention(q, k, v, scale=scale)))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(
            flash_attention(q, k, v, scale=scale, interpret=True)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(a, b_, atol=5e-5, rtol=5e-4)


def test_flash_bf16_forward_close():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), 2, 2, 197, 64, jnp.bfloat16)
    ref = xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32), scale=64 ** -0.5)
    out = flash_attention(q, k, v, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_auto_impl_on_cpu_is_xla():
    # On CPU, impl="auto" must not try to compile Mosaic kernels.
    from devt_tpu.ops.attention import scaled_dot_product_attention
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), 1, 1, 8, 16)
    out = scaled_dot_product_attention(q, k, v, impl="auto")
    ref = xla_attention(q, k, v, scale=16 ** -0.5)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_auto_keeps_xla_under_pallas_disabled(monkeypatch):
    """'auto' must not pick Pallas while tracing a GSPMD body whose
    operands may be sharded (pallas_call is opaque to GSPMD) — the jnp
    path (Megatron-shardable) is the tensor-parallel tier.  The signal
    is the scope-bounded ``pallas_disabled`` context (ADVICE r2 replaced
    the round-2 write-once module global: building a mesh no longer
    permanently disables fused kernels for later single-device work)."""
    from devt_tpu.models.layers import ViTBlock
    from devt_tpu.ops import attention as att
    from devt_tpu.parallel import mesh as mesh_mod

    monkeypatch.setattr(att.jax, "default_backend", lambda: "tpu")
    assert att._auto_pallas_ok()

    block = ViTBlock(64, 2, 32, 128)
    x = jnp.zeros((2, 16, 64))
    with att.pallas_disabled():
        assert not att._auto_pallas_ok()
        assert not block._fused_eligible(x, deterministic=True)
        with att.pallas_disabled():    # re-entrant
            assert not att._auto_pallas_ok()
        assert not att._auto_pallas_ok()

    # scope-bounded: fused kernels come back after the context exits,
    # and building meshes (any path) does not disturb the signal
    assert att._auto_pallas_ok()
    mesh_mod.make_mesh(dp=8, mp=1)
    assert att._auto_pallas_ok()
    assert block._fused_eligible(x, deterministic=True)
