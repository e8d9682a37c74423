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
                      axis_name: str, n_shards: int,
                      interpret: bool = False, impl: str = "auto"):
    """Local shard of a pre-norm ViT block (x: (B, S/n, D)); the same
    math as ops/fused_block.reference_vit_block, with the attention core
    swapped for the kv ring.

    Two tiers (``impl``): ``"pallas"`` runs every hop in the ring-step
    kernels with model-dtype (bf16) MXU matmuls around them — the same
    structure as the TP block (parallel/tp_block._tp_block_local), which
    prices the shard_map machinery at ~+24% vs the fused block instead
    of the jnp tier's +149% (round-4 verdict item 2); ``"jnp"`` is the
    f32 einsum tier (any shape, any backend); ``"auto"`` picks pallas on
    TPU (or under ``interpret``) when the chunk fits one kv block."""
    from devt_tpu.ops.flash_attention import fits_single_block
    from devt_tpu.ops.fused_block import _gelu, _ln

    f32 = jnp.float32
    b, s_local, dim = x.shape
    d = dim // heads
    hd = heads * d
    use_kernel = impl == "pallas" or (
        impl == "auto" and fits_single_block(s_local)
        and (interpret or jax.default_backend() == "tpu"))

    x32 = x.astype(f32)
    a, _, _, _ = _ln(x32, params["g1"].astype(f32), params["b1"].astype(f32))

    if use_kernel:
        # model-dtype matmuls (MXU rate on bf16 params), f32 accumulate
        wqkv = params["wqkv"].astype(x.dtype)
        if n_shards == 1:
            qkv = jax.lax.dot_general(
                a.astype(x.dtype), wqkv,
                (((2,), (0,)), ((), ())), preferred_element_type=f32)
            att = ring_mha(qkv.astype(x.dtype), heads=heads, scale=scale,
                           kv_len=kv_len, axis_name=axis_name,
                           n_shards=1, interpret=interpret)
        else:
            # q and the rotating kv as TWO projections: same FLOPs as
            # one packed matmul, no post-hoc slice copies (the weight
            # slices fold at trace time)
            q = jax.lax.dot_general(
                a.astype(x.dtype), wqkv[:, :hd],
                (((2,), (0,)), ((), ())), preferred_element_type=f32)
            kvp = jax.lax.dot_general(
                a.astype(x.dtype), wqkv[:, hd:],
                (((2,), (0,)), ((), ())), preferred_element_type=f32)
            att = ring_mha_split(
                q.astype(x.dtype), kvp.astype(x.dtype), heads=heads,
                scale=scale, kv_len=kv_len, axis_name=axis_name,
                n_shards=n_shards, interpret=interpret)
        u = x32 + jax.lax.dot_general(
            att.astype(x.dtype), params["wo"].astype(x.dtype),
            (((2,), (0,)), ((), ())), preferred_element_type=f32) \
            + params["bo"].astype(f32)
        h2, _, _, _ = _ln(u, params["g2"].astype(f32),
                          params["b2"].astype(f32))
        ff = _gelu(jax.lax.dot_general(
            h2.astype(x.dtype), params["w1"].astype(x.dtype),
            (((2,), (0,)), ((), ())), preferred_element_type=f32)
            + params["bb1"].astype(f32))
        y = u + jax.lax.dot_general(
            ff.astype(x.dtype), params["w2"].astype(x.dtype),
            (((2,), (0,)), ((), ())), preferred_element_type=f32) \
            + params["bb2"].astype(f32)
        return y.astype(x.dtype)

    qkv = a @ params["wqkv"].astype(f32)                 # (B, S/n, 3HD)

    def split(t):   # heads are contiguous i*d slices (fused-block layout)
        return t.reshape(b, s_local, heads, d).transpose(0, 2, 1, 3)

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
                   axis: str = "data", interpret: bool = False,
                   impl: str = "auto"):
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
        axis_name=axis, n_shards=n, interpret=interpret, impl=impl)
    pspec = jax.tree_util.tree_map(lambda _: P(), params)
    # check_vma=False: the pallas tier's kernels carry no varying-mesh-
    # axes annotation (repo convention — parallel/train_step.py:349)
    mapped = jax.shard_map(fn, mesh=mesh,
                           in_specs=(P(None, axis, None), pspec),
                           out_specs=P(None, axis, None),
                           check_vma=False)
    return mapped(x, params)


# ---------------------------------------------------------------------------
# Kernel-backed ring MHA (round-4 verdict item 2): every hop's FLOPs run
# in the ring-step Pallas kernels (ops/flash_attention.ring_step_fwd/bwd
# — the same per-head MXU math as fused_mha), the across-hop flash
# combine is a cheap elementwise rescale, and the WHOLE ring is one
# custom-vjp whose backward re-rotates the kv shards: dq accumulates on
# the device, each shard's (dk, dv) travels the full circle home.  The
# jnp tier above remains the fallback for shapes past the single-block
# VMEM budget and for callers outside a shard_map.
# ---------------------------------------------------------------------------


def _colmask(blk, s_chunk: int, s_p: int, kv_len: int):
    """(1, s_p) additive f32 mask for the kv shard ``blk``: local row j
    covers global column ``blk*s_chunk + j``; rows past ``s_chunk`` are
    this shard's tile padding, columns past ``kv_len`` global padding."""
    j = jnp.arange(s_p, dtype=jnp.int32)[None, :]
    valid = (j < s_chunk) & (blk * s_chunk + j < kv_len)
    return jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)


def _combine(o, lse, o_i, lse_i, heads: int):
    """Flash combine of two per-head block-normalised partials.
    o/o_i (B, S, H*D) [o f32 accumulator], lse/lse_i (B, S, H) f32."""
    b, s, hd = o.shape
    d = hd // heads
    oh = o.reshape(b, s, heads, d)
    oih = o_i.astype(jnp.float32).reshape(b, s, heads, d)
    mx = jnp.maximum(lse, lse_i)
    w = jnp.exp(lse - mx)[..., None]                  # (B, S, H, 1)
    wi = jnp.exp(lse_i - mx)[..., None]
    o_new = (oh * w + oih * wi) / (w + wi)
    lse_new = mx + jnp.log(jnp.exp(lse - mx) + jnp.exp(lse_i - mx))
    return o_new.reshape(b, s, hd), lse_new


def _lse_heads(lse_lanes, heads: int):
    """(B, S, H*LANES) kernel lse → compact (B, S, H)."""
    b, s, _ = lse_lanes.shape
    return lse_lanes.reshape(b, s, heads, -1)[..., 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _ring_mha(q, kv, heads, scale, kv_len, s_chunk, axis_name, n_shards,
              interpret):
    o, _ = _ring_mha_fwd(q, kv, heads, scale, kv_len, s_chunk, axis_name,
                         n_shards, interpret)
    return o


def _ring_mha_fwd(q, kv, heads, scale, kv_len, s_chunk, axis_name,
                  n_shards, interpret):
    from devt_tpu.ops.flash_attention import ring_step_fwd

    b, s_p, hd = q.shape
    if n_shards == 1:
        o, lse_lanes = ring_step_fwd(
            q, kv, _colmask(jnp.int32(0), s_chunk, s_p, kv_len),
            heads=heads, scale=scale, interpret=interpret)
        return o, (q, kv, o, _lse_heads(lse_lanes, heads))

    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def body(carry, t):
        kv_cur, o, lse = carry
        blk = jax.lax.rem(my - t + n_shards, n_shards)
        o_i, lse_i = ring_step_fwd(
            q, kv_cur, _colmask(blk, s_chunk, s_p, kv_len),
            heads=heads, scale=scale, interpret=interpret)
        o, lse = _combine(o, lse, o_i, _lse_heads(lse_i, heads), heads)
        kv_nxt = jax.lax.ppermute(kv_cur, axis_name, perm)
        return (kv_nxt, o, lse), None

    o0 = jnp.zeros((b, s_p, hd), jnp.float32)
    lse0 = jnp.full((b, s_p, heads), NEG_INF, jnp.float32)
    # derive varying-over-axis typing from q (see ring_attention_local)
    o0 = o0 + q[..., :1].astype(jnp.float32) * 0.0
    lse0 = lse0 + q[..., :1].astype(jnp.float32) * 0.0
    (_, o, lse), _ = jax.lax.scan(
        body, (kv, o0, lse0), jnp.arange(n_shards))
    o = o.astype(q.dtype)
    return o, (q, kv, o, lse)


def _ring_mha_bwd(heads, scale, kv_len, s_chunk, axis_name, n_shards,
                  interpret, res, do):
    from devt_tpu.ops.flash_attention import _LANES, ring_step_bwd

    q, kv, o, lse = res
    b, s_p, hd = q.shape
    lse_lanes = jnp.broadcast_to(lse[..., None],
                                 (b, s_p, heads, _LANES)
                                 ).reshape(b, s_p, heads * _LANES)
    if n_shards == 1:
        dq, dkv = ring_step_bwd(
            q, kv, _colmask(jnp.int32(0), s_chunk, s_p, kv_len),
            o, lse_lanes, do, heads=heads, scale=scale, interpret=interpret)
        return dq.astype(q.dtype), dkv.astype(kv.dtype)

    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def body(carry, t):
        kv_cur, dkv_cur, dq = carry
        blk = jax.lax.rem(my - t + n_shards, n_shards)
        dq_p, dkv_p = ring_step_bwd(
            q, kv_cur, _colmask(blk, s_chunk, s_p, kv_len),
            o, lse_lanes, do, heads=heads, scale=scale, interpret=interpret)
        dq = dq + dq_p
        dkv_cur = dkv_cur + dkv_p
        # the accumulator travels WITH its shard: after n hops each
        # shard's (dk, dv) has collected every device's contribution
        # and sits back on its home device
        kv_nxt = jax.lax.ppermute(kv_cur, axis_name, perm)
        dkv_nxt = jax.lax.ppermute(dkv_cur, axis_name, perm)
        return (kv_nxt, dkv_nxt, dq), None

    dkv0 = jnp.zeros((b, s_p, 2 * hd), jnp.float32) \
        + q[..., :1].astype(jnp.float32) * 0.0
    dq0 = jnp.zeros((b, s_p, hd), jnp.float32) \
        + q[..., :1].astype(jnp.float32) * 0.0
    (_, dkv, dq), _ = jax.lax.scan(
        body, (kv, dkv0, dq0), jnp.arange(n_shards))
    return dq.astype(q.dtype), dkv.astype(kv.dtype)


_ring_mha.defvjp(_ring_mha_fwd, _ring_mha_bwd)


def ring_mha_split(q, kv, *, heads: int, scale: float | None = None,
                   kv_len: int | None = None, axis_name: str = SEQ_AXIS,
                   n_shards: int = 1, interpret: bool = False):
    """Ring attention on pre-split q (B, S/n, H*D) / packed kv
    (B, S/n, 2*H*D) — call INSIDE shard_map.  ``kv_len`` is the true
    GLOBAL kv length (tile padding beyond it is masked).  Every hop runs
    in the ring-step Pallas kernels; the whole ring is one custom-vjp
    (backward re-rotates kv and walks each shard's gradient home).
    Callers that own the qkv projection should produce q and kv as two
    matmuls (a @ wqkv[:, :hd] / a @ wqkv[:, hd:]) — slicing a packed
    qkv tensor instead costs an extra HBM round trip per block
    (chip-measured ~0.25 ms at the sp bench shape)."""
    from devt_tpu.ops.flash_attention import _round_up

    b, s_chunk, hd = q.shape
    d = hd // heads
    if scale is None:
        scale = d ** -0.5
    if kv_len is None:
        kv_len = n_shards * s_chunk
    s_p = _round_up(s_chunk, 16)
    if s_p != s_chunk:
        pad = ((0, 0), (0, s_p - s_chunk), (0, 0))
        q, kv = jnp.pad(q, pad), jnp.pad(kv, pad)
    o = _ring_mha(q, kv, heads, scale, kv_len, s_chunk, axis_name,
                  n_shards, interpret)
    return o[:, :s_chunk]


def ring_mha(qkv, *, heads: int, scale: float | None = None,
             kv_len: int | None = None, axis_name: str = SEQ_AXIS,
             n_shards: int = 1, interpret: bool = False):
    """Packed-qkv ring attention over a sharded sequence — call INSIDE
    shard_map.  qkv (B, S/n, 3*H*D) in fused_mha's (3, H, D) feature
    order → (B, S/n, H*D).  A 1-shard "ring" IS single-device attention,
    so it dispatches straight to the packed fused_mha kernel (no q/kv
    split copies, no combine); rings of n > 1 split once and rotate kv
    (:func:`ring_mha_split`)."""
    from devt_tpu.ops.flash_attention import fused_mha

    if n_shards == 1:
        return fused_mha(qkv, heads=heads, scale=scale, kv_len=kv_len,
                         interpret=interpret)
    hd = qkv.shape[-1] // 3
    return ring_mha_split(qkv[..., :hd], qkv[..., hd:], heads=heads,
                          scale=scale, kv_len=kv_len, axis_name=axis_name,
                          n_shards=n_shards, interpret=interpret)
