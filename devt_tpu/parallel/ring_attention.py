"""Ring / context-parallel attention over a sharded sequence axis.

The blockwise flash kernel (devt_tpu/ops/flash_attention.py) was written
so that a ring extension over ICI reuses its math unchanged (SURVEY.md §5
— the reference has no sequence parallelism; its sequences are tiny, and
this is scaling headroom, not parity).  This module supplies that
extension: K/V live sharded over a mesh axis, each device keeps its local
Q block, and the K/V shards rotate around the ring via ``lax.ppermute``
while an online-softmax accumulator (running max ``m``, normaliser ``l``,
unnormalised output ``acc``) combines the per-block partials — exactly
the flash combine rule, executed across devices instead of across grid
steps.

The per-block local attention is expressed in jnp (compiler-friendly; on
TPU XLA fuses it, and the same combine algebra matches the Pallas
kernel's), so the whole ring is differentiable: ``lax.scan`` +
``ppermute`` have exact VJPs, giving ring-parallel backward for free.

Communication pattern: each step sends the local K/V shard to the next
device on the ring (`(i, (i+1) % n)`), which on a TPU torus rides
neighbour ICI links — bandwidth-optimal context parallelism.
"""

from __future__ import annotations

import contextlib
import functools
import threading

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30
SEQ_AXIS = "seq"

_sp_gate = threading.local()


@contextlib.contextmanager
def sp_scope(mesh: Mesh):
    """Trace-time context: the sp_shard_map step factories
    (parallel/train_step.py) set this around their shard_map trace so
    ``ViTTransformer`` (models/layers.py) knows its body executes inside
    a shard_map with a ``seq`` axis and routes its stacked block stack
    through the kv ring (:func:`_ring_block_local`) on locally-sliced
    tokens.  Re-entrant, thread-local, scope-bounded — the
    pipeline_scope / tp_pallas_scope / moe_ep_scope discipline."""
    prev = getattr(_sp_gate, "mesh", None)
    _sp_gate.mesh = mesh
    try:
        yield
    finally:
        _sp_gate.mesh = prev


def active_sp_mesh():
    """The mesh set by :func:`sp_scope`, or None."""
    return getattr(_sp_gate, "mesh", None)


def _local_block(q, k, v, *, scale: float, col_offset, kv_len: int):
    """One flash block: returns (unnormalised o, running max m, partial l).

    q (B, H, Sq, D) f32-accum; k/v (B, H, Skv, D); ``col_offset`` is the
    global position of this kv shard (traced), ``kv_len`` the true global
    kv length (static) — positions beyond it are tile padding.
    """
    s = jnp.einsum("bhid,bhjd->bhij", q, k,
                   preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3) + col_offset
    s = jnp.where(col < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)                  # (B,H,Sq,1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return o, m, l


def ring_attention_local(q, k, v, *, axis_name: str, n_shards: int,
                         scale: float | None = None,
                         kv_len: int | None = None):
    """Ring attention body — call INSIDE shard_map.

    q, k, v: the LOCAL shards (B, H, S/n, D), sequence sharded over
    ``axis_name``.  Returns the local (B, H, S/n, D) output shard.
    """
    b, h, s_local, d = q.shape
    if scale is None:
        scale = d ** -0.5
    total = n_shards * k.shape[2]
    if kv_len is None:
        kv_len = total
    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    q32 = q.astype(jnp.float32)
    # derive the initial carries from q so they inherit its
    # varying-over-axis type (shard_map rejects unvarying scan carries
    # that become varying inside the body)
    acc0 = jnp.zeros_like(q32)
    m0 = q32[..., :1] * 0.0 + NEG_INF
    l0 = q32[..., :1] * 0.0

    def body(carry, t):
        k_cur, v_cur, acc, m, l = carry
        # after t rotations device ``my`` holds kv block (my - t) mod n
        blk = jax.lax.rem(my - t + n_shards, n_shards)
        o_u, m_blk, l_blk = _local_block(
            q32, k_cur, v_cur, scale=scale,
            col_offset=blk * k.shape[2], kv_len=kv_len)
        m_new = jnp.maximum(m, m_blk)
        a1 = jnp.exp(m - m_new)
        a2 = jnp.exp(m_blk - m_new)
        acc = acc * a1 + o_u * a2
        l = l * a1 + l_blk * a2
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, acc, m_new, l), None

    (_, _, acc, _, l), _ = jax.lax.scan(
        body, (k, v, acc0, m0, l0), jnp.arange(n_shards))
    return (acc / l).astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, *, axis: str = "data",
                   scale: float | None = None, kv_len: int | None = None):
    """Context-parallel attention: shards the sequence axis of global
    (B, H, S, D) q/k/v over ``mesh[axis]`` and runs the kv ring.

    S must divide evenly by the axis size.  Differentiable (scan +
    ppermute VJPs); parity vs single-device attention is tested on the
    virtual 8-device CPU mesh (tests/test_ring_attention.py).
    """
    n = mesh.shape[axis]
    assert q.shape[2] % n == 0, (q.shape, n)
    spec = P(None, None, axis, None)
    fn = functools.partial(ring_attention_local, axis_name=axis,
                           n_shards=n, scale=scale, kv_len=kv_len)
    mapped = jax.shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                           out_specs=spec)
    return mapped(q, k, v)


# ---------------------------------------------------------------------------
# Sequence-parallel transformer LAYER: everything except attention is
# per-token, so a whole pre-norm ViT block runs with the sequence axis
# sharded — LN/projections/FFN stay local, only K/V shards ride the ring.
# ---------------------------------------------------------------------------


def _ring_block_local(x, params, *, heads: int, scale: float, kv_len: int,
                      axis_name: str, n_shards: int):
    """Local shard of a pre-norm ViT block (x: (B, S/n, D)); the same
    math as ops/fused_block.reference_vit_block, with the attention core
    swapped for the kv ring."""
    from devt_tpu.ops.fused_block import _gelu, _ln

    f32 = jnp.float32
    b, s_local, dim = x.shape
    d = dim // heads
    x32 = x.astype(f32)
    a, _, _, _ = _ln(x32, params["g1"].astype(f32), params["b1"].astype(f32))
    qkv = a @ params["wqkv"].astype(f32)                 # (B, S/n, 3HD)

    def split(t):   # heads are contiguous i*d slices (fused-block layout)
        return t.reshape(b, s_local, heads, d).transpose(0, 2, 1, 3)

    hd = heads * d
    q, k, v = (split(qkv[..., :hd]), split(qkv[..., hd:2 * hd]),
               split(qkv[..., 2 * hd:]))
    att = ring_attention_local(q, k, v, axis_name=axis_name,
                               n_shards=n_shards, scale=scale,
                               kv_len=kv_len)
    att = att.transpose(0, 2, 1, 3).reshape(b, s_local, hd).astype(f32)
    u = x32 + att @ params["wo"].astype(f32) + params["bo"].astype(f32)
    h2, _, _, _ = _ln(u, params["g2"].astype(f32), params["b2"].astype(f32))
    ff = _gelu(h2 @ params["w1"].astype(f32) + params["bb1"].astype(f32))
    y = u + ff @ params["w2"].astype(f32) + params["bb2"].astype(f32)
    return y.astype(x.dtype)


def ring_vit_block(x, params, mesh: Mesh, *, heads: int,
                   scale: float | None = None, kv_len: int | None = None,
                   axis: str = "data"):
    """Context-parallel pre-norm ViT block over ``mesh[axis]``.

    x (B, S, D) with S divisible by the axis size; ``params`` is the
    fused-block dict (g1/b1/wqkv/wo/bo/g2/b2/w1/bb1/w2/bb2), replicated.
    Long-context scaling headroom beyond the reference (SURVEY §5): per-
    device memory is O(S/n) for activations while LN/projections/FFN
    remain purely local; only attention communicates (neighbour ICI).
    Differentiable end to end.  Parity vs the single-device block is
    tested on the virtual 8-device mesh (tests/test_ring_attention.py).
    """
    n = mesh.shape[axis]
    b, s, dim = x.shape
    assert s % n == 0, (x.shape, n)
    d = dim // heads
    fn = functools.partial(
        _ring_block_local, heads=heads,
        scale=d ** -0.5 if scale is None else scale,
        kv_len=s if kv_len is None else kv_len,
        axis_name=axis, n_shards=n)
    pspec = jax.tree_util.tree_map(lambda _: P(), params)
    mapped = jax.shard_map(fn, mesh=mesh,
                           in_specs=(P(None, axis, None), pspec),
                           out_specs=P(None, axis, None))
    return mapped(x, params)
