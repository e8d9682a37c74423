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


# ---------------------------------------------------------------------------
# Kernel-backed ring (round-4 verdict item 2): every hop in the ring-step
# Pallas kernels (interpret mode here), whole ring one custom-vjp.
# ---------------------------------------------------------------------------


def _ring_mha_global(qkv, heads, mesh, n, *, kv_len, scale):
    """shard_map a global (B, S, 3HD) packed qkv through ring_mha."""
    import functools

    from jax.sharding import PartitionSpec as P

    from devt_tpu.parallel.ring_attention import ring_mha

    fn = functools.partial(ring_mha, heads=heads, scale=scale,
                           kv_len=kv_len, axis_name="sp", n_shards=n,
                           interpret=True)
    mapped = jax.shard_map(fn, mesh=mesh, in_specs=(P(None, "sp", None),),
                           out_specs=P(None, "sp", None), check_vma=False)
    return mapped(qkv)


def _packed_reference(qkv, heads, *, kv_len, scale):
    """jnp attention on the packed (3, H, D) layout."""
    b, s, f = qkv.shape
    d = f // (3 * heads)
    hd = heads * d

    def split(t):
        return t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)

    q, k, v = (split(qkv[..., :hd]), split(qkv[..., hd:2 * hd]),
               split(qkv[..., 2 * hd:]))
    out = xla_attention(q, k, v, scale=scale, kv_len=kv_len)
    return out.transpose(0, 2, 1, 3).reshape(b, s, hd)


def test_ring_mha_kernel_parity_forward():
    """Kernel ring == single-device attention, incl. a PARTIAL boundary
    shard and a FULLY-padded shard (s=128 over 8 chunks of 16 with
    kv_len=100: shard 6 partial, shard 7 all padding)."""
    rng = np.random.default_rng(0)
    b, s, heads, d = 2, 128, 2, 32
    kv_len, scale = 100, d ** -0.5
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * heads * d)) * 0.3,
                      jnp.float32)
    mesh = _mesh(8, "sp")
    out = _ring_mha_global(qkv, heads, mesh, 8, kv_len=kv_len, scale=scale)
    ref = _packed_reference(qkv, heads, kv_len=kv_len, scale=scale)
    np.testing.assert_allclose(np.asarray(out)[:, :kv_len],
                               np.asarray(ref)[:, :kv_len],
                               atol=2e-5, rtol=1e-5)


def test_ring_mha_kernel_parity_grads():
    """Ring custom-vjp (dq local accumulate + dkv walked home around the
    ring) matches plain AD through single-device attention."""
    rng = np.random.default_rng(1)
    b, s, heads, d = 1, 64, 2, 16
    kv_len, scale = 55, d ** -0.5
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * heads * d)) * 0.3,
                      jnp.float32)
    w = jnp.asarray(rng.standard_normal((b, s, heads * d)), jnp.float32)
    mesh = _mesh(4, "sp")

    def loss_ring(qkv):
        out = _ring_mha_global(qkv, heads, mesh, 4, kv_len=kv_len,
                               scale=scale)
        # only real tokens contribute (pad rows are undefined by contract)
        return jnp.sum(out[:, :kv_len] * w[:, :kv_len])

    def loss_ref(qkv):
        out = _packed_reference(qkv, heads, kv_len=kv_len, scale=scale)
        return jnp.sum(out[:, :kv_len] * w[:, :kv_len])

    g_ring = jax.grad(loss_ring)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref),
                               atol=5e-5, rtol=1e-4)


def test_ring_mha_single_shard_matches_fused_mha():
    """n_shards=1 short-circuits scan/ppermute/combine: one kernel call,
    same result as ops/flash_attention.fused_mha."""
    from devt_tpu.ops.flash_attention import fused_mha
    from devt_tpu.parallel.ring_attention import ring_mha

    rng = np.random.default_rng(2)
    b, s, heads, d = 2, 48, 2, 16
    kv_len, scale = 41, d ** -0.5
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * heads * d)) * 0.3,
                      jnp.float32)
    mesh = _mesh(1, "sp")
    out = _ring_mha_global(qkv, heads, mesh, 1, kv_len=kv_len, scale=scale)
    ref = fused_mha(qkv, heads=heads, scale=scale, kv_len=kv_len,
                    interpret=True)
    np.testing.assert_allclose(np.asarray(out)[:, :kv_len],
                               np.asarray(ref)[:, :kv_len],
                               atol=2e-5, rtol=1e-5)


def test_ring_vit_block_pallas_tier_matches_reference():
    """The kernel tier of the WHOLE sequence-parallel block (bf16-style
    model-dtype matmuls + ring kernels) matches the f32 reference block:
    fwd and grads, on the 8-device mesh."""
    from devt_tpu.ops.fused_block import reference_vit_block
    from devt_tpu.parallel.ring_attention import ring_vit_block

    rng = np.random.default_rng(3)
    B, S, D, H, MLP = 2, 64, 64, 2, 128
    kv_len = 57

    def P_(*sh, scale=0.1):
        return jnp.asarray(rng.standard_normal(sh) * scale, jnp.float32)

    params = {"g1": jnp.ones((1, D)), "b1": jnp.zeros((1, D)),
              "wqkv": P_(D, 3 * D), "wo": P_(D, D),
              "bo": jnp.zeros((1, D)),
              "g2": jnp.ones((1, D)), "b2": jnp.zeros((1, D)),
              "w1": P_(D, MLP), "bb1": jnp.zeros((1, MLP)),
              "w2": P_(MLP, D), "bb2": jnp.zeros((1, D))}
    x = jnp.asarray(rng.standard_normal((B, S, D)) * 0.3, jnp.float32)
    mesh = _mesh(4, "data")
    scale = (D // H) ** -0.5

    def f_ring(x, params):
        y = ring_vit_block(x, params, mesh, heads=H, scale=scale,
                           kv_len=kv_len, interpret=True, impl="pallas")
        return jnp.sum(y[:, :kv_len] ** 2)

    def f_ref(x, params):
        y = reference_vit_block(x, params, H, scale, kv_len)
        return jnp.sum(y[:, :kv_len] ** 2)

    (l1, g1), (l2, g2) = (jax.value_and_grad(f, argnums=(0, 1))(x, params)
                          for f in (f_ring, f_ref))
    l1g, l1p = g1
    l2g, l2p = g2
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(l1g), np.asarray(l2g),
                               atol=5e-4, rtol=5e-3)
    for ka in sorted(params):
        np.testing.assert_allclose(np.asarray(l1p[ka]),
                                   np.asarray(l2p[ka]),
                                   atol=5e-4, rtol=5e-3, err_msg=ka)
