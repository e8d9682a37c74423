"""Blockwise flash attention for TPU, written in Pallas.

This is the fused kernel that replaces the reference's materialised
O(n^2) attention (reference: src/models/vit.py:46-58 computes the full
``dots`` matrix with einsum, and torch ``TransformerEncoderLayer`` does the
same inside ``MultiheadAttention``, src/models/transformer.py:39-47).

Design notes (TPU-first, see pallas_guide.md):

  * Online-softmax blockwise algorithm: the score matrix is never
    materialised in HBM.  Grid = ``(batch*heads, num_q_blocks,
    num_kv_blocks)``; the innermost kv dimension iterates sequentially on
    TPU, carrying running max / sum / output accumulator in VMEM scratch.
  * Sequence lengths pad to a multiple of the block size, masked with a
    large negative score so softmax ignores them (``-1e30`` rather than
    ``-inf`` keeps fully-padded rows NaN-free).  The head dim is NEVER
    padded — Mosaic pads lanes internally for free, and an
    HBM-materialised pad to 128 measured ~40% of the ViViT train step
    before it was removed (see ``flash_attention``).
  * Forward saves the per-row logsumexp so the backward pass can
    recompute probabilities blockwise (standard flash backward):
    one kernel accumulates dQ over kv blocks, a second accumulates
    dK/dV over q blocks.  The logsumexp residual carries a broadcast
    128-lane trailing dim — Mosaic requires the last two block dims
    to tile to (8, 128), and this layout lets both backward kernels
    slice a (block_q, 1) column without any in-kernel transpose.
    ``delta = rowsum(dO * O)`` is recomputed inside the backward kernels
    (cheap VPU work) instead of being written to HBM.
  * The kernels are written blockwise so a ring/context-parallel
    extension over ICI reuses them unchanged (SURVEY.md §5).

The sequence lengths used by the reference models are small (14 scene
tokens, 197 ViViT patch tokens — src/config.yaml:5, src/models/vit.py:87),
so a single kv block usually suffices; the blockwise structure is about
scaling headroom, not necessity.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fits_single_block(s: int) -> bool:
    """True when a sequence fits ONE kv block of the batched
    single-block kernels (fused_mha / the fused ViT block).  The single
    source of truth for the 512 VMEM-budget limit — attention.py and
    models/layers.py consult this instead of copying the constant."""
    return _round_up(s, _LANES) <= 512


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr,
                *, scale: float, kv_len: int, block_kv: int):
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (block_kv, d)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (block_q, block_kv)

    # Mask kv positions beyond the true sequence length (the pad we added
    # to reach the tile size — NOT a data mask; the reference attends over
    # its own zero-padding and that semantics is preserved).
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_kv
    s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:, :1]                                   # (block_q, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                                  # (block_q, block_kv)
    alpha = jnp.exp(m_prev - m_new)                         # (block_q, 1)
    l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(kv_idx == n_kv - 1)
    def _finish():
        o_ref[0] = (acc_scr[...] / l_scr[:, :1]).astype(o_ref.dtype)
        lse_ref[0] = m_scr[...] + jnp.log(l_scr[...])


def _fwd(q, k, v, *, scale, kv_len, block_q, block_kv, interpret):
    bh, sq, d = q.shape
    skv = k.shape[1]
    n_q, n_kv = sq // block_q, skv // block_kv

    grid = (bh, n_q, n_kv)
    out_shape = (
        jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        # logsumexp with broadcast lanes — see module docstring.
        jax.ShapeDtypeStruct((bh, sq, _LANES), jnp.float32),
    )
    kernel = functools.partial(
        _fwd_kernel, scale=scale, kv_len=kv_len, block_kv=block_kv)

    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, _LANES), lambda b, i, j: (b, i, 0)),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dq_ref,
                   dq_scr, delta_scr,
                   *, scale: float, kv_len: int, block_kv: int):
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)
        delta = jnp.sum(do_ref[0].astype(jnp.float32)
                        * o_ref[0].astype(jnp.float32),
                        axis=-1, keepdims=True)
        delta_scr[...] = jnp.broadcast_to(delta, delta_scr.shape)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]        # (block_q, 1)
    delta = delta_scr[:, :1]       # (block_q, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_kv
    s = jnp.where(col < kv_len, s, NEG_INF)

    p = jnp.exp(s - lse)                                    # (block_q, block_kv)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale
    dq_scr[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kv_idx == n_kv - 1)
    def _finish():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr,
                    *, scale: float, kv_len: int, block_kv: int):
    q_idx = pl.program_id(2)
    n_q = pl.num_programs(2)
    kv_idx = pl.program_id(1)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]        # (block_q, 1)
    delta = jnp.sum(do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
                    axis=-1, keepdims=True)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_kv
    s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse)

    # dV += P^T @ dO
    dv_scr[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dS = P * (dP - delta);  dK += dS^T @ Q
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale
    dk_scr[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(q_idx == n_q - 1)
    def _finish():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd(q, k, v, o, lse, do, *, scale, kv_len, block_q, block_kv, interpret):
    bh, sq, d = q.shape
    skv = k.shape[1]
    n_q, n_kv = sq // block_q, skv // block_kv

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=kv_len,
                          block_kv=block_kv),
        grid=(bh, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, _LANES), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, o, do, lse)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, kv_len=kv_len,
                          block_kv=block_kv),
        grid=(bh, n_kv, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, _LANES), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_kv, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, j, i: (b, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, o, do, lse)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public entry point: padding wrapper + custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_padded(q, k, v, scale, kv_len, block_q, block_kv, interpret):
    o, _ = _fwd(q, k, v, scale=scale, kv_len=kv_len, block_q=block_q,
                block_kv=block_kv, interpret=interpret)
    return o


def _flash_padded_fwd(q, k, v, scale, kv_len, block_q, block_kv, interpret):
    o, lse = _fwd(q, k, v, scale=scale, kv_len=kv_len, block_q=block_q,
                  block_kv=block_kv, interpret=interpret)
    return o, (q, k, v, o, lse)


def _flash_padded_bwd(scale, kv_len, block_q, block_kv, interpret, res, do):
    q, k, v, o, lse = res
    dq, dk, dv = _bwd(q, k, v, o, lse, do, scale=scale, kv_len=kv_len,
                      block_q=block_q, block_kv=block_kv, interpret=interpret)
    return dq, dk, dv


_flash_padded.defvjp(_flash_padded_fwd, _flash_padded_bwd)


def flash_attention(q, k, v, *, scale: float | None = None,
                    kv_len: int | None = None,
                    block_q: int = 128, block_kv: int = 128,
                    interpret: bool = False):
    """Fused softmax attention.  ``q, k, v: (B, H, S, D)`` → ``(B, H, Sq, D)``.

    ``scale`` defaults to ``1/sqrt(D)`` with the *unpadded* head dim, matching
    the reference (src/models/vit.py:37, torch MultiheadAttention).
    ``kv_len``: treat only the first ``kv_len`` kv positions as real (for
    callers that pre-pad the token axis to tile multiples); defaults to the
    full kv length.
    """
    b, h, sq, d = q.shape
    skv = kv_len if kv_len is not None else k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    skv_in = k.shape[2]
    # The head dim is NEVER padded: Mosaic accepts a block whose last dim
    # equals the full array dim (it pads lanes internally, for free) —
    # an HBM-materialised pad to 128 would double q/k/v traffic and add
    # pad/slice/copy ops around every layer (measured ~40% of the ViViT
    # train step before this was removed).
    single_block = (sq == skv_in and _round_up(sq, _LANES) <= 512)
    if single_block:
        # sequence only needs the bf16 sublane tile (16); often a no-op
        # because the models pre-pad tokens to 16 (token_pad)
        block_q = block_kv = _round_up(sq, 16)
    else:
        block_q = min(block_q, _round_up(sq, _LANES))
        block_kv = min(block_kv, _round_up(skv_in, _LANES))
    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(skv_in, block_kv)

    def pad(x, s_p):
        if s_p == x.shape[2]:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_p - x.shape[2]), (0, 0)))

    qp = pad(q, sq_p).reshape(b * h, sq_p, d)
    kp = pad(k, skv_p).reshape(b * h, skv_p, d)
    vp = pad(v, skv_p).reshape(b * h, skv_p, d)
    # Kernels mask kv positions >= the true (unpadded) kv length.
    if single_block:
        # short-sequence fast path: whole kv in one block, G heads per
        # grid step, no online-softmax rescaling
        o = _flash_single(qp, kp, vp, scale, skv, interpret)
    else:
        o = _flash_padded(qp, kp, vp, scale, skv, block_q, block_kv,
                          interpret)
    o = o.reshape(b, h, sq_p, d)
    if sq_p != sq:
        o = o[:, :, :sq]
    return o


# ---------------------------------------------------------------------------
# Batched single-block kernel — the fast path for the model family's
# short sequences (≤ one kv block): G (batch·head) rows per grid step
# amortise grid overhead, and with the whole kv present there is no
# online-softmax rescaling at all.
# ---------------------------------------------------------------------------


def _fwd_single_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                       *, scale: float, kv_len: int):
    q = q_ref[...]   # (G, S, D)
    k = k_ref[...]
    v = v_ref[...]

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                                   # (G, S, S)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < kv_len, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)      # (G, S, 1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / l).astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)
    lse_ref[...] = jnp.broadcast_to(m + jnp.log(l), lse_ref.shape)


def _bwd_single_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                       dq_ref, dk_ref, dv_ref,
                       *, scale: float, kv_len: int):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    lse = lse_ref[..., :1]                      # (G, S, 1)
    delta = jnp.sum(do.astype(jnp.float32) * o_ref[...].astype(jnp.float32),
                    axis=-1, keepdims=True)     # (G, S, 1)

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse)                        # (G, Sq, Skv)

    dv_ref[...] = jax.lax.dot_general(
        p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale               # (G, Sq, Skv)
    dq_ref[...] = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[...] = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _pick_group(bh: int, s_p: int, d_p: int, bytes_budget: int = 12 << 20,
                cap: int = 12) -> int:
    """Largest G dividing bh whose working set fits in VMEM.

    Empirically tuned on v5e for the (256, 128) padded shape the model
    family hits: the forward kernel compiles fastest at G=12 (G=16 exceeds
    the 16MB scoped-vmem limit once Mosaic's double buffering is counted);
    the backward kernel carries twice the buffers (6 inputs + 3 outputs)
    and tops out at G=6."""
    per_row = (3 * s_p * d_p * 2      # q, k, v bf16-ish
               + 2 * s_p * s_p * 4    # scores + probs f32
               + 2 * s_p * d_p * 4)   # o accum + lse
    g = min(cap, max(1, bytes_budget // max(per_row, 1)))
    while g > 1 and bh % g:
        g -= 1
    return int(g)


def _fwd_single(q, k, v, *, scale, kv_len, interpret):
    bh, s_p, d_p = q.shape
    g = _pick_group(bh, s_p, d_p)
    kernel = functools.partial(_fwd_single_kernel, scale=scale, kv_len=kv_len)
    return pl.pallas_call(
        kernel,
        grid=(bh // g,),
        in_specs=[pl.BlockSpec((g, s_p, d_p), lambda b: (b, 0, 0))] * 3,
        out_specs=(
            pl.BlockSpec((g, s_p, d_p), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, s_p, _LANES), lambda b: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, s_p, d_p), q.dtype),
            jax.ShapeDtypeStruct((bh, s_p, _LANES), jnp.float32),
        ),
        interpret=interpret,
    )(q, k, v)


def _bwd_single(q, k, v, o, lse, do, *, scale, kv_len, interpret):
    bh, s_p, d_p = q.shape
    g = _pick_group(bh, s_p, d_p, bytes_budget=6 << 20, cap=6)
    kernel = functools.partial(_bwd_single_kernel, scale=scale, kv_len=kv_len)
    spec = pl.BlockSpec((g, s_p, d_p), lambda b: (b, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(bh // g,),
        in_specs=[spec, spec, spec, spec, spec,
                  pl.BlockSpec((g, s_p, _LANES), lambda b: (b, 0, 0))],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        interpret=interpret,
    )(q, k, v, o, do, lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_single(q, k, v, scale, kv_len, interpret):
    o, _ = _fwd_single(q, k, v, scale=scale, kv_len=kv_len,
                       interpret=interpret)
    return o


def _flash_single_fwd(q, k, v, scale, kv_len, interpret):
    o, lse = _fwd_single(q, k, v, scale=scale, kv_len=kv_len,
                         interpret=interpret)
    return o, (q, k, v, o, lse)


def _flash_single_bwd(scale, kv_len, interpret, res, do):
    q, k, v, o, lse = res
    return _bwd_single(q, k, v, o, lse, do, scale=scale, kv_len=kv_len,
                       interpret=interpret)


_flash_single.defvjp(_flash_single_fwd, _flash_single_bwd)


# ---------------------------------------------------------------------------
# Fused multi-head attention over the packed qkv tensor.
#
# Consuming qkv as (B, S, 3, H, D) straight out of the fused projection and
# emitting (B, S, H*D) removes the head split/merge transposes AND the
# layout copies XLA otherwise inserts around the attention custom-call
# (trace-measured at ~1.8 ms/layer/step on the ViViT bench: qkv copies
# {4,1,3,0,2}<->{0,4,3,2,1} plus the pad_add gradient assembly).  The
# backward kernel writes the packed dqkv gradient directly.
#
# Attention-probability dropout (torch MHA semantics: dropout applied to
# the normalised softmax probabilities, kept entries scaled by 1/(1-rate)
# — src/models/transformer.py:39-47) runs IN-KERNEL via the hardware PRNG:
# both passes seed ``pltpu.prng_seed(seed + program_id)`` and draw the
# per-head mask bits in the same order, so the backward mask is identical
# to the forward one without materialising (B·H, S, S) masks in HBM.  The
# softmax statistics (lse) are computed before the mask — dropout-after-
# softmax — so ``delta = rowsum(dO·O)`` stays valid in the backward pass.
# ---------------------------------------------------------------------------


def _dropout_cutoff(rate: float):
    return jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))


def _random_keep(shape, rate: float):
    bits = pltpu.prng_random_bits(shape)
    if bits.dtype != jnp.uint32:
        bits = pltpu.bitcast(bits, jnp.uint32)
    return bits >= _dropout_cutoff(rate)


def _mha_fwd_kernel(qkv_ref, *refs, heads: int, d: int, scale: float,
                    kv_len: int, dropout_rate: float = 0.0):
    if dropout_rate > 0.0:
        seed_ref, o_ref, lse_ref = refs
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    else:
        o_ref, lse_ref = refs
    for i in range(heads):
        q = qkv_ref[:, :, i * d:(i + 1) * d]                  # (G, S, D)
        k = qkv_ref[:, :, (heads + i) * d:(heads + i + 1) * d]
        v = qkv_ref[:, :, (2 * heads + i) * d:(2 * heads + i + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale      # (G, S, S)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pn = p / l
        if dropout_rate > 0.0:
            keep = _random_keep(s.shape, dropout_rate)
            pn = jnp.where(keep, pn / (1.0 - dropout_rate), 0.0)
        o = jax.lax.dot_general(
            pn.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, i * d:(i + 1) * d] = o.astype(o_ref.dtype)
        lse_ref[:, :, i * _LANES:(i + 1) * _LANES] = jnp.broadcast_to(
            m + jnp.log(l), (m.shape[0], m.shape[1], _LANES))


def _mha_bwd_kernel(qkv_ref, *refs, heads: int, d: int, scale: float,
                    kv_len: int, dropout_rate: float = 0.0):
    if dropout_rate > 0.0:
        seed_ref, o_ref, do_ref, lse_ref, dqkv_ref = refs
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        inv_keep = 1.0 / (1.0 - dropout_rate)
    else:
        o_ref, do_ref, lse_ref, dqkv_ref = refs
    for i in range(heads):
        q = qkv_ref[:, :, i * d:(i + 1) * d]
        k = qkv_ref[:, :, (heads + i) * d:(heads + i + 1) * d]
        v = qkv_ref[:, :, (2 * heads + i) * d:(2 * heads + i + 1) * d]
        do = do_ref[:, :, i * d:(i + 1) * d]
        o = o_ref[:, :, i * d:(i + 1) * d]
        lse = lse_ref[:, :, i * _LANES:i * _LANES + 1]        # (G, S, 1)
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)

        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)
        if dropout_rate > 0.0:
            # identical stream to the forward pass (same seed, same order)
            keep = _random_keep(s.shape, dropout_rate)
            mask = jnp.where(keep, inv_keep, 0.0)
            p_masked = p * mask
        else:
            p_masked = p

        dv = jax.lax.dot_general(
            p_masked.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            dp = dp * mask
        ds = p * (dp - delta) * scale
        dq = jax.lax.dot_general(
            ds.astype(k.dtype), k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds.astype(q.dtype), q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dqkv_ref[:, :, i * d:(i + 1) * d] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, (heads + i) * d:(heads + i + 1) * d] = \
            dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, (2 * heads + i) * d:(2 * heads + i + 1) * d] = \
            dv.astype(dqkv_ref.dtype)


def _mha_group(b: int, s_p: int, heads: int, d: int, bwd: bool) -> int:
    # conservative: Mosaic double-buffers every grid input/output block
    per_row = 2 * ((6 if bwd else 3) * heads * s_p * d * 2   # qkv (+dqkv,o,do)
                   + heads * s_p * _LANES * 4)               # lse
    per_row += 3 * s_p * s_p * 4 + 2 * s_p * heads * d * 4   # transients
    budget = (8 if bwd else 10) << 20
    g = min(6 if bwd else 12, max(1, budget // per_row))
    while g > 1 and b % g:
        g -= 1
    return int(g)


def _mha_fwd(qkv, seed, *, heads, d, scale, kv_len, rate, interpret):
    b, s_p, f = qkv.shape
    # with dropout the grid grouping MUST match the backward call — the
    # PRNG stream is seeded per grid step, so a different g would pair
    # rows with different mask bits
    g = _mha_group(b, s_p, heads, d, bwd=rate > 0.0)
    kernel = functools.partial(_mha_fwd_kernel, heads=heads, d=d,
                               scale=scale, kv_len=kv_len,
                               dropout_rate=rate)
    in_specs = [pl.BlockSpec((g, s_p, f), lambda i: (i, 0, 0))]
    args = [qkv]
    if rate > 0.0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(seed)
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((g, s_p, heads * d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, s_p, heads * _LANES), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s_p, heads * d), qkv.dtype),
            jax.ShapeDtypeStruct((b, s_p, heads * _LANES), jnp.float32),
        ),
        interpret=interpret,
    )(*args)


def _mha_bwd_call(qkv, seed, o, lse, do, *, heads, d, scale, kv_len, rate,
                  interpret):
    b, s_p, f = qkv.shape
    g = _mha_group(b, s_p, heads, d, bwd=True)
    kernel = functools.partial(_mha_bwd_kernel, heads=heads, d=d,
                               scale=scale, kv_len=kv_len,
                               dropout_rate=rate)
    in_specs = [pl.BlockSpec((g, s_p, f), lambda i: (i, 0, 0))]
    args = [qkv]
    if rate > 0.0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(seed)
    in_specs += [
        pl.BlockSpec((g, s_p, heads * d), lambda i: (i, 0, 0)),
        pl.BlockSpec((g, s_p, heads * d), lambda i: (i, 0, 0)),
        pl.BlockSpec((g, s_p, heads * _LANES), lambda i: (i, 0, 0)),
    ]
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, s_p, f), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        interpret=interpret,
    )(*args, o, do, lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _fused_mha(qkv, seed, heads, d, scale, kv_len, rate, interpret):
    o, _ = _mha_fwd(qkv, seed, heads=heads, d=d, scale=scale, kv_len=kv_len,
                    rate=rate, interpret=interpret)
    return o


def _fused_mha_fwd(qkv, seed, heads, d, scale, kv_len, rate, interpret):
    o, lse = _mha_fwd(qkv, seed, heads=heads, d=d, scale=scale,
                      kv_len=kv_len, rate=rate, interpret=interpret)
    return o, (qkv, seed, o, lse)


def _fused_mha_bwd(heads, d, scale, kv_len, rate, interpret, res, do):
    qkv, seed, o, lse = res
    dqkv = _mha_bwd_call(qkv, seed, o, lse, do, heads=heads, d=d,
                         scale=scale, kv_len=kv_len, rate=rate,
                         interpret=interpret)
    return dqkv, jnp.zeros_like(seed)


_fused_mha.defvjp(_fused_mha_fwd, _fused_mha_bwd)


def fused_mha(qkv, *, heads: int, scale: float | None = None,
              kv_len: int | None = None, dropout_rate: float = 0.0,
              dropout_rng=None, interpret: bool = False):
    """Packed-qkv attention.  qkv (B, S, 3*H*D) → (B, S, H*D).

    Feature order of the last axis must be (3, H, D) — the layout a fused
    qkv Dense produces when its output features are laid out
    [q_h0..q_hH, k_h0.., v_h0..] per (3, H, D) reshape.  Single-kv-block
    sequences only (every model in this family); falls back upstream
    otherwise.

    ``dropout_rate`` > 0 (with a ``dropout_rng``) applies torch-MHA-style
    attention-probability dropout inside the kernel (hardware PRNG; the
    backward pass regenerates the identical mask).
    """
    b, s, f = qkv.shape
    d = f // (3 * heads)
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    s_p = _round_up(s, 16)
    kv_len_eff = kv_len if kv_len is not None else s
    if s_p != s:
        qkv = jnp.pad(qkv, ((0, 0), (0, s_p - s), (0, 0)))
    rate = float(dropout_rate)
    if rate > 0.0:
        assert dropout_rng is not None, "dropout_rate > 0 needs a rng"
        seed = jax.random.randint(dropout_rng, (1,), 0, 2 ** 30,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    o = _fused_mha(qkv, seed, heads, d, scale, kv_len_eff, rate, interpret)
    if s_p != s:
        o = o[:, :s]
    return o


# ---------------------------------------------------------------------------
# Ring-step kernels: one hop of ring/context-parallel attention.
#
# The SP/CP surface (parallel/ring_attention.py) rotates packed K/V shards
# around the device ring; each hop is "local q against the current kv
# shard" — exactly the per-head math of the _mha_* kernels above with the
# q and kv sources SEPARATED (q stays local, kv arrives via ppermute) and
# the kv-position mask DYNAMIC (which global columns the shard covers
# depends on the traced ring step, so the mask rides in as a (1, S) f32
# additive bias instead of the static ``kv_len`` iota the single-device
# kernels use).  The forward hop returns per-head normalised (o, lse);
# the across-hop flash combine and the ring backward's dq/dkv
# accumulation live in parallel/ring_attention.py (the ring is ONE
# custom-vjp there — these kernels are its building blocks).  Round-4
# verdict item 2: the previous jnp hop priced at +149% vs the fused
# block; these kernels put every hop's FLOPs on the same MXU path as
# fused_mha.
# ---------------------------------------------------------------------------


def _ring_fwd_kernel(q_ref, kv_ref, mask_ref, o_ref, lse_ref,
                     *, heads: int, d: int, scale: float):
    mask = mask_ref[...]                                     # (1, S) f32
    for i in range(heads):
        q = q_ref[:, :, i * d:(i + 1) * d]                   # (G, S, D)
        k = kv_ref[:, :, i * d:(i + 1) * d]
        v = kv_ref[:, :, (heads + i) * d:(heads + i + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale      # (G, S, S)
        s = s + mask[None]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            (p / l).astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, i * d:(i + 1) * d] = o.astype(o_ref.dtype)
        lse_ref[:, :, i * _LANES:(i + 1) * _LANES] = jnp.broadcast_to(
            m + jnp.log(l), (m.shape[0], m.shape[1], _LANES))


def _ring_bwd_kernel(q_ref, kv_ref, mask_ref, o_ref, do_ref, lse_ref,
                     dq_ref, dkv_ref, *, heads: int, d: int, scale: float):
    """One backward hop: grads of the GLOBAL attention output wrt the
    local q and the currently-held kv shard.  ``lse_ref`` carries the
    final (all-shards) logsumexp, so ``p = exp(s - lse)`` is each
    column's true global attention weight and the standard flash
    backward identities apply per hop; dq sums across hops on the
    device, dkv travels home with its shard (ring_attention.py)."""
    mask = mask_ref[...]
    for i in range(heads):
        q = q_ref[:, :, i * d:(i + 1) * d]
        k = kv_ref[:, :, i * d:(i + 1) * d]
        v = kv_ref[:, :, (heads + i) * d:(heads + i + 1) * d]
        do = do_ref[:, :, i * d:(i + 1) * d]
        o = o_ref[:, :, i * d:(i + 1) * d]
        lse = lse_ref[:, :, i * _LANES:i * _LANES + 1]       # (G, S, 1)
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)

        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        s = s + mask[None]
        p = jnp.exp(s - lse)                                 # (G, S, S)

        dv = jax.lax.dot_general(
            p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dq = jax.lax.dot_general(
            ds.astype(k.dtype), k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds.astype(q.dtype), q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dq_ref[:, :, i * d:(i + 1) * d] = dq.astype(dq_ref.dtype)
        dkv_ref[:, :, i * d:(i + 1) * d] = dk.astype(dkv_ref.dtype)
        dkv_ref[:, :, (heads + i) * d:(heads + i + 1) * d] = \
            dv.astype(dkv_ref.dtype)


def _ring_group(b: int, s_p: int, heads: int, d: int, bwd: bool) -> int:
    # same budget model as _mha_group: Mosaic double-buffers every
    # block.  HD-sized buffers: fwd q + kv(2) + o = 4; bwd additionally
    # o, do, dq, dkv(2) on top of q + kv(2) = 8
    n_hd_bufs = 8 if bwd else 4
    per_row = 2 * ((n_hd_bufs * heads * s_p * d * 2)
                   + heads * s_p * _LANES * 4)
    per_row += 3 * s_p * s_p * 4 + 2 * s_p * heads * d * 4
    budget = (8 if bwd else 10) << 20
    g = min(6 if bwd else 12, max(1, budget // per_row))
    while g > 1 and b % g:
        g -= 1
    return int(g)


def ring_step_fwd(q, kv, mask, *, heads: int, scale: float,
                  interpret: bool = False):
    """One forward ring hop.  q (B, S, H*D) local queries, kv
    (B, S, 2*H*D) the currently-held packed shard, mask (1, S) additive
    f32 column bias (0 valid / NEG_INF masked).  Returns per-head
    block-normalised o (B, S, H*D) and lse (B, S, H*_LANES) f32."""
    b, s_p, hd = q.shape
    d = hd // heads
    g = _ring_group(b, s_p, heads, d, bwd=False)
    kernel = functools.partial(_ring_fwd_kernel, heads=heads, d=d,
                               scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, s_p, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, s_p, 2 * hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s_p), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((g, s_p, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, s_p, heads * _LANES), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s_p, hd), q.dtype),
            jax.ShapeDtypeStruct((b, s_p, heads * _LANES), jnp.float32),
        ),
        interpret=interpret,
    )(q, kv, mask)


def ring_step_bwd(q, kv, mask, o, lse, do, *, heads: int, scale: float,
                  interpret: bool = False):
    """One backward ring hop → (dq_partial, dkv_partial), both f32 (they
    accumulate across hops — bf16 accumulation would round n times)."""
    b, s_p, hd = q.shape
    d = hd // heads
    g = _ring_group(b, s_p, heads, d, bwd=True)
    kernel = functools.partial(_ring_bwd_kernel, heads=heads, d=d,
                               scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, s_p, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, s_p, 2 * hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s_p), lambda i: (0, 0)),
            pl.BlockSpec((g, s_p, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, s_p, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, s_p, heads * _LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((g, s_p, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, s_p, 2 * hd), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s_p, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, s_p, 2 * hd), jnp.float32),
        ),
        interpret=interpret,
        # arg order matches the kernel signature: (..., o, do, lse)
    )(q, kv, mask, o, do, lse)
