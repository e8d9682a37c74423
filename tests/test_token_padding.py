"""Token tile-padding must not change model outputs (pad masked in attn)."""

import jax
import jax.numpy as jnp
import numpy as np

from devt_tpu.models.vivit import ViViT
import pytest

pytestmark = pytest.mark.slow


def test_vivit_padded_equals_unpadded():
    kwargs = dict(image_size=32, patch_size=16, num_classes=7, num_frames=3,
                  dim=32, depth=2, heads=2, dim_head=16,
                  attention_impl="xla")
    # 32/16 → 4 patches + cls = 5 tokens; pad to 16
    padded = ViViT(**kwargs, token_pad=16)
    plain = ViViT(**kwargs, token_pad=0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 3, 3, 32, 32)), jnp.float32)
    params = plain.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    out_plain = plain.apply({"params": params}, x)
    out_padded = padded.apply({"params": params}, x)
    np.testing.assert_allclose(out_padded, out_plain, atol=1e-5, rtol=1e-5)


def test_vivit_mean_pool_with_padding():
    kwargs = dict(image_size=32, patch_size=16, num_classes=7, num_frames=3,
                  dim=32, depth=1, heads=2, dim_head=16, pool="mean",
                  attention_impl="xla")
    padded = ViViT(**kwargs, token_pad=16)
    plain = ViViT(**kwargs, token_pad=0)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 3, 3, 32, 32)), jnp.float32)
    params = plain.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    np.testing.assert_allclose(padded.apply({"params": params}, x),
                               plain.apply({"params": params}, x),
                               atol=1e-5, rtol=1e-5)


def test_xla_attention_kv_len_mask():
    from devt_tpu.ops.attention import xla_attention

    rng = jax.random.PRNGKey(2)
    q = jax.random.normal(rng, (1, 2, 8, 16))
    ref = xla_attention(q, q, q, scale=0.25)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, 8), (0, 0)))
    out = xla_attention(qp, qp, qp, scale=0.25, kv_len=8)[:, :, :8]
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_flash_attention_kv_len_override():
    from devt_tpu.ops.flash_attention import flash_attention
    from devt_tpu.ops.attention import xla_attention

    rng = jax.random.PRNGKey(3)
    q = jax.random.normal(rng, (1, 2, 20, 64))
    ref = xla_attention(q, q, q, scale=64 ** -0.5)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, 12), (0, 0)))
    out = flash_attention(qp, qp, qp, kv_len=20, interpret=True)[:, :, :20]
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
