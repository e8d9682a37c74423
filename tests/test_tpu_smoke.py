"""Real-TPU smoke tests — run with DEVT_TESTS_ON_TPU=1 (skipped on CPU).

These compile the Pallas kernels natively (Mosaic) and exercise a train
step on the chip.  They exist because interpret-mode correctness does not
prove Mosaic lowers a kernel (5-D shape casts, scoped-vmem limits, …).
"""

import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    not os.environ.get("DEVT_TESTS_ON_TPU")
    or jax.default_backend() != "tpu",
    reason="needs DEVT_TESTS_ON_TPU=1 and a TPU backend")


def test_flash_attention_compiles_and_matches():
    import jax.numpy as jnp

    from devt_tpu.ops.attention import xla_attention
    from devt_tpu.ops.flash_attention import flash_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 197, 64),
                          jnp.bfloat16)
    out = jax.jit(lambda q: flash_attention(q, q, q))(q)
    ref = xla_attention(q, q, q, scale=64 ** -0.5)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    assert err < 5e-3


def test_fused_mha_compiles():
    import jax.numpy as jnp

    from devt_tpu.ops.attention import packed_mha

    qkv = jax.random.normal(jax.random.PRNGKey(1), (4, 208, 576),
                            jnp.bfloat16)
    g = jax.jit(jax.grad(lambda q: jnp.sum(
        packed_mha(q, heads=3, kv_len=197).astype(jnp.float32))))(qkv)
    assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))


def test_fused_block_compiles_and_trains():
    import jax.numpy as jnp

    from devt_tpu.models.layers import ViTBlock

    x = jax.random.normal(jax.random.PRNGKey(2), (8, 208, 192), jnp.bfloat16)
    block = ViTBlock(192, 3, 64, 768, dtype=jnp.bfloat16)
    params = block.init(jax.random.PRNGKey(3), x, True, 197)["params"]

    @jax.jit
    def loss_and_grad(p):
        def loss(p):
            return jnp.sum(block.apply({"params": p}, x, True, 197)
                           .astype(jnp.float32) ** 2)
        return jax.value_and_grad(loss)(p)

    l, g = loss_and_grad(params)
    assert np.isfinite(float(l))
    flat = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x.astype(jnp.float32))))
               for x in flat)
