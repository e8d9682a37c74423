"""Fully-fused pre-norm ViT block: one Pallas kernel per pass.

The ViViT space transformer is the bench-critical compute
(reference architecture: src/models/vit.py:60-75).  Unfused, every
sub-op round-trips activations through HBM (LN stats, qkv, attention
out, FFN hidden — trace-measured at ~2/3 of step time beyond the raw
matmul FLOPs).  This kernel runs the whole block per G-sequence tile
with every intermediate resident in VMEM:

    a   = LN1(x)                      (γ1, β1; f32 stats)
    qkv = a @ Wqkv                    (bias-free, reference to_qkv)
    att = MHA(qkv)                    (per-head lane slices, kv-len mask)
    u   = x + att @ Wo + bo
    b   = LN2(u)
    y   = u + gelu(b @ W1 + b1) @ W2 + b2     (tanh-approx gelu)

The backward kernel recomputes the forward from (x, lse) in VMEM and
emits dx plus every parameter gradient; dW/db accumulate across the
sequential TPU grid via constant-index output blocks (initialised at
step 0, written back once at the last step).

Single-kv-block sequences only (S ≤ 512 — every model in this family).
Dropout runs IN-KERNEL via the hardware PRNG at the reference's three
block sites (attention out-projection, FFN hidden, FFN output —
src/models/vit.py:23,25,43); the backward regenerates the forward's
masks from the same seed and draw order, which is why the forward's
grid grouping must match the backward's whenever dropout is active.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# single source of truth for dropout-mask semantics (cutoff + keep bits)
from devt_tpu.ops.flash_attention import (NEG_INF, _LANES,
                                            _random_keep, _round_up)

# v5e has far more physical VMEM than the compiler's 16MB default scoped
# limit; raising it per-kernel lets larger sequence groups pipeline.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

LN_EPS = 1e-5


def _ln(x32, gamma, beta):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = (x32 - mu) * rstd
    return xhat * gamma + beta, xhat, mu, rstd


_GELU_C = math.sqrt(2.0 / math.pi)
_GELU_K = 0.044715


def _gelu(z32):
    """tanh-approximation GELU (torch ``nn.GELU(approximate='tanh')``;
    max abs err vs exact erf-gelu ≈ 3e-4 — an order of magnitude below
    the TPU bf16-matmul noise floor of ~3e-3 this kernel already runs
    at).  Chosen over the erf form for VPU cost: an Abramowitz–Stegun
    erf (divide + exp + 5-term poly, ~15 VPU ops/element) measured
    ~4 ms of the 24 ms ViViT train step on v5e; the tanh form returns
    that time (step 24.1 → 20.8 ms).  The unfused flax path keeps
    exact erf (torch default); the two agree within the fused parity
    tolerances."""
    t = jnp.tanh(_GELU_C * (z32 + _GELU_K * z32 * z32 * z32))
    return 0.5 * z32 * (1.0 + t)


def _dgelu(z32):
    inner = _GELU_C * (z32 + _GELU_K * z32 * z32 * z32)
    t = jnp.tanh(inner)
    dinner = _GELU_C * (1.0 + 3.0 * _GELU_K * z32 * z32)
    return 0.5 * (1.0 + t) + 0.5 * z32 * (1.0 - t * t) * dinner


def _mask_bias(shape, kv_len):
    """Additive key-padding mask, built ONCE per kernel instead of an
    iota+compare+select per head per pass: masked columns get NEG_INF,
    which exp() turns into exact zeros downstream."""
    col = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return jnp.where(col < kv_len, 0.0, NEG_INF)


def _mha_fwd(qkv, heads, d, scale, kv_len, dtype):
    """In-VMEM attention.  qkv (G, S, 3HD) f32-accum → (att (G,S,HD) f32,
    lse (G,S,H) f32)."""
    outs = []
    lses = []
    bias = _mask_bias((qkv.shape[0], qkv.shape[1], qkv.shape[1]), kv_len)
    for i in range(heads):
        q = qkv[:, :, i * d:(i + 1) * d]
        k = qkv[:, :, (heads + i) * d:(heads + i + 1) * d]
        v = qkv[:, :, (2 * heads + i) * d:(2 * heads + i + 1) * d]
        s = jax.lax.dot_general(
            q.astype(dtype), k.astype(dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        # normalize AFTER the PV matmul: a (S, d) row-scale instead of an
        # (S, S) divide — the VPU work drops by S/d per row
        o = jax.lax.dot_general(
            p.astype(dtype), v.astype(dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / l
        outs.append(o)
        lses.append(m + jnp.log(l))
    return jnp.concatenate(outs, axis=-1), jnp.concatenate(lses, axis=-1)


def _mha_fwd_bwd(qkv, lse, datt, heads, d, scale, kv_len, dtype):
    """One-pass attention recompute + backward: returns (att, dqkv).

    The backward kernel needs both the forward output (``att``, for the
    Wo weight grad) and the qkv gradient.  Computing them together means
    the score matrix S and the probabilities p = exp(S - lse) are built
    ONCE per head — a separate ``_mha_fwd`` + ``_mha_bwd`` pair rebuilt
    them twice (an extra QK^T matmul, mask, and (S, S) exp per head)."""
    outs = []
    dparts_q, dparts_k, dparts_v = [], [], []
    bias = _mask_bias((qkv.shape[0], qkv.shape[1], qkv.shape[1]), kv_len)
    for i in range(heads):
        q = qkv[:, :, i * d:(i + 1) * d].astype(dtype)
        k = qkv[:, :, (heads + i) * d:(heads + i + 1) * d].astype(dtype)
        v = qkv[:, :, (2 * heads + i) * d:(2 * heads + i + 1) * d].astype(dtype)
        do = datt[:, :, i * d:(i + 1) * d]
        l_i = lse[:, :, i:i + 1]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale + bias
        p = jnp.exp(s - l_i)
        o = jax.lax.dot_general(
            p.astype(dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        delta = jnp.sum(do * o, axis=-1, keepdims=True)
        dv = jax.lax.dot_general(
            p.astype(dtype), do.astype(dtype), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do.astype(dtype), v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dq = jax.lax.dot_general(
            ds.astype(dtype), k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds.astype(dtype), q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        outs.append(o)
        dparts_q.append(dq)
        dparts_k.append(dk)
        dparts_v.append(dv)
    return (jnp.concatenate(outs, axis=-1),
            jnp.concatenate(dparts_q + dparts_k + dparts_v, axis=-1))


def _ln_bwd(dy_hat, xhat, rstd):
    """d/dx of LN given upstream-through-scale grad (dy*γ), per row."""
    m1 = jnp.mean(dy_hat, axis=-1, keepdims=True)
    m2 = jnp.mean(dy_hat * xhat, axis=-1, keepdims=True)
    return rstd * (dy_hat - m1 - xhat * m2)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, wo_ref, bo_ref,
                g2_ref, b2_ref, w1_ref, bb1_ref, w2_ref, bb2_ref,
                *refs, heads: int, d: int, scale: float, kv_len: int,
                dropout_rate: float = 0.0):
    if dropout_rate > 0.0:
        seed_ref, y_ref, u_ref, lse_ref = refs
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        ik = 1.0 / (1.0 - dropout_rate)

        def drop(t):
            return jnp.where(_random_keep(t.shape, dropout_rate),
                             t * ik, 0.0)
    else:
        y_ref, u_ref, lse_ref = refs
    dtype = x_ref.dtype
    x = x_ref[...].astype(jnp.float32)                       # (G, S, D)
    a, _, mu1, rstd1 = _ln(x, g1_ref[0].astype(jnp.float32),
                           b1_ref[0].astype(jnp.float32))
    qkv = jax.lax.dot_general(
        a.astype(dtype), wqkv_ref[...].astype(dtype),
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    att, lse = _mha_fwd(qkv, heads, d, scale, kv_len, dtype)
    oproj = jax.lax.dot_general(
        att.astype(dtype), wo_ref[...].astype(dtype),
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32) \
        + bo_ref[0].astype(jnp.float32)
    # reference dropout sites (src/models/vit.py:23,25,43): attention
    # out-projection, FFN hidden, FFN output — mask bits drawn in this
    # order in BOTH passes so the backward masks are identical
    if dropout_rate > 0.0:
        oproj = drop(oproj)
    u = x + oproj
    b, _, mu2, rstd2 = _ln(u, g2_ref[0].astype(jnp.float32),
                           b2_ref[0].astype(jnp.float32))
    z1 = jax.lax.dot_general(
        b.astype(dtype), w1_ref[...].astype(dtype),
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32) \
        + bb1_ref[0].astype(jnp.float32)
    h = _gelu(z1)
    if dropout_rate > 0.0:
        h = drop(h)
    z2 = jax.lax.dot_general(
        h.astype(dtype), w2_ref[...].astype(dtype),
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32) \
        + bb2_ref[0].astype(jnp.float32)
    if dropout_rate > 0.0:
        z2 = drop(z2)
    y = u + z2
    y_ref[...] = y.astype(y_ref.dtype)
    u_ref[...] = u.astype(u_ref.dtype)
    # residual lanes: [lse (H), mu1, rstd1, mu2, rstd2] — storing the LN
    # stats lets the backward rebuild xhat elementwise instead of
    # re-reducing mean/var over the feature axis
    res = jnp.concatenate([lse, mu1, rstd1, mu2, rstd2], axis=-1)
    lse_ref[...] = jnp.pad(res, ((0, 0), (0, 0),
                                 (0, lse_ref.shape[-1] - heads - 4)))


# ---------------------------------------------------------------------------
# backward kernel — recomputes forward, accumulates param grads over grid
# ---------------------------------------------------------------------------


def _bwd_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, wo_ref, bo_ref,
                g2_ref, b2_ref, w1_ref, bb1_ref, w2_ref, bb2_ref,
                u_ref, lse_ref, dy_ref,
                *refs, heads: int, d: int, scale: float, kv_len: int,
                dropout_rate: float = 0.0):
    if dropout_rate > 0.0:
        seed_ref = refs[0]
        refs = refs[1:]
    (dx_ref, dg1_ref, db1_ref, dwqkv_ref, dwo_ref, dbo_ref,
     dg2_ref, db2_ref, dw1_ref, dbb1_ref, dw2_ref, dbb2_ref) = refs
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)
    dtype = x_ref.dtype

    if dropout_rate > 0.0:
        # regenerate the forward's mask bits: same seed, same draw order
        # (out-proj (G,S,D), FFN hidden (G,S,mlp), FFN out (G,S,D))
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        ik = 1.0 / (1.0 - dropout_rate)
        gsz, s, dim = x_ref.shape
        mlp = w1_ref.shape[1]
        keep_o = _random_keep((gsz, s, dim), dropout_rate)
        keep_h = _random_keep((gsz, s, mlp), dropout_rate)
        keep_y = _random_keep((gsz, s, dim), dropout_rate)

        def drop(t, keep):
            return jnp.where(keep, t * ik, 0.0)

    @pl.when(step == 0)
    def _init():
        for ref in (dg1_ref, db1_ref, dwqkv_ref, dwo_ref, dbo_ref,
                    dg2_ref, db2_ref, dw1_ref, dbb1_ref, dw2_ref, dbb2_ref):
            ref[...] = jnp.zeros_like(ref)

    x = x_ref[...].astype(jnp.float32)
    u = u_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    res = lse_ref[...]
    lse = res[:, :, :heads]
    mu1, rstd1 = res[:, :, heads:heads + 1], res[:, :, heads + 1:heads + 2]
    mu2, rstd2 = res[:, :, heads + 2:heads + 3], res[:, :, heads + 3:heads + 4]
    g1 = g1_ref[0].astype(jnp.float32)
    g2 = g2_ref[0].astype(jnp.float32)

    # --- recompute forward pieces (LN stats come from the residual:
    #     xhat is elementwise, no feature-axis re-reductions) ---
    xhat1 = (x - mu1) * rstd1
    a = xhat1 * g1 + b1_ref[0].astype(jnp.float32)
    qkv = jax.lax.dot_general(
        a.astype(dtype), wqkv_ref[...].astype(dtype),
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    xhat2 = (u - mu2) * rstd2
    b = xhat2 * g2 + b2_ref[0].astype(jnp.float32)
    z1 = jax.lax.dot_general(
        b.astype(dtype), w1_ref[...].astype(dtype),
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32) \
        + bb1_ref[0].astype(jnp.float32)
    h = _gelu(z1)
    if dropout_rate > 0.0:
        h = drop(h, keep_h)            # the forward's DROPPED hidden

    def flat(t):  # (G, S, F) → (G*S, F) for the weight-grad contractions
        return t.reshape(-1, t.shape[-1])

    # --- FFN backward ---
    # dz2 = grad at the (pre-final-dropout) FFN output
    dz2 = dy if dropout_rate == 0.0 else drop(dy, keep_y)
    dh = jax.lax.dot_general(
        dz2.astype(dtype), w2_ref[...].astype(dtype),
        (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dw2_ref[...] += jax.lax.dot_general(
        flat(h).astype(dtype), flat(dz2).astype(dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbb2_ref[...] += jnp.sum(dz2, axis=(0, 1))[None, :]
    if dropout_rate > 0.0:
        dh = drop(dh, keep_h)
    dz1 = dh * _dgelu(z1)
    dw1_ref[...] += jax.lax.dot_general(
        flat(b).astype(dtype), flat(dz1).astype(dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbb1_ref[...] += jnp.sum(dz1, axis=(0, 1))[None, :]
    db = jax.lax.dot_general(
        dz1.astype(dtype), w1_ref[...].astype(dtype),
        (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    # --- LN2 backward ---
    dg2_ref[...] += jnp.sum(db * xhat2, axis=(0, 1))[None, :]
    db2_ref[...] += jnp.sum(db, axis=(0, 1))[None, :]
    du = dy + _ln_bwd(db * g2, xhat2, rstd2)

    # --- attention out-proj + core backward (one-pass recompute) ---
    doproj = du if dropout_rate == 0.0 else drop(du, keep_o)
    datt = jax.lax.dot_general(
        doproj.astype(dtype), wo_ref[...].astype(dtype),
        (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    att, dqkv = _mha_fwd_bwd(qkv, lse, datt, heads, d, scale, kv_len, dtype)
    dwo_ref[...] += jax.lax.dot_general(
        flat(att).astype(dtype), flat(doproj).astype(dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbo_ref[...] += jnp.sum(doproj, axis=(0, 1))[None, :]

    # --- qkv projection + LN1 backward ---
    da = jax.lax.dot_general(
        dqkv.astype(dtype), wqkv_ref[...].astype(dtype),
        (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dwqkv_ref[...] += jax.lax.dot_general(
        flat(a).astype(dtype), flat(dqkv).astype(dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dg1_ref[...] += jnp.sum(da * xhat1, axis=(0, 1))[None, :]
    db1_ref[...] += jnp.sum(da, axis=(0, 1))[None, :]
    dx = du + _ln_bwd(da * g1, xhat1, rstd1)
    dx_ref[...] = dx.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------


def _row_spec(g, s, f):
    return pl.BlockSpec((g, s, f), lambda i: (i, 0, 0))


def _param_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, (lambda i: (0,) * nd))


def _group(b: int, s: int, dim: int, mlp: int, bwd: bool) -> int:
    """Empirically tuned on v5e at (512, 208, 192, mlp 768) with the
    raised per-kernel vmem limit: G=8 for both passes.  (Before the
    one-pass attention recompute the backward only fit G=4; the merge
    halved the live score/probability buffers and the re-sweep moved the
    optimum to G=8: 19.50 vs 19.88 ms full-step at G=4, with G=2 at
    20.62 and forward G=16 neutral.)"""
    per_row = (s * dim * 4 * (8 if bwd else 4)
               + s * s * 4 * 2
               + s * mlp * 4 * (3 if bwd else 2))
    budget = (28 if bwd else 20) << 20
    g = min(8, max(1, budget // per_row))
    while g > 1 and b % g:
        g -= 1
    return int(g)


def _params_tuple(params):
    return (params["g1"], params["b1"], params["wqkv"], params["wo"],
            params["bo"], params["g2"], params["b2"], params["w1"],
            params["bb1"], params["w2"], params["bb2"])


def _param_specs(params):
    return [_param_spec(p.shape) for p in _params_tuple(params)]


def _fwd_call(x, params, seed, *, heads, scale, kv_len, rate, interpret):
    bsz, s, dim = x.shape
    d = dim // heads
    mlp = params["w1"].shape[1]
    # with dropout the grid grouping MUST match the backward call: the
    # PRNG stream is seeded per grid step, so a different g would pair
    # rows with different mask bits
    g = _group(bsz, s, dim, mlp, bwd=rate > 0.0)
    # the residual needs only heads+4 lanes (lse + two LN mean/rstd
    # pairs); an 8-lane tile (not 128) keeps its HBM traffic ~16x below a
    # full-width tile (it is read back by the backward kernel)
    lse_lanes = _round_up(heads + 4, 8)
    kernel = functools.partial(_fwd_kernel, heads=heads, d=d, scale=scale,
                               kv_len=kv_len, dropout_rate=rate)
    in_specs = [_row_spec(g, s, dim)] + _param_specs(params)
    args = [x, *_params_tuple(params)]
    if rate > 0.0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(seed)
    return pl.pallas_call(
        kernel,
        grid=(bsz // g,),
        in_specs=in_specs,
        out_specs=(
            _row_spec(g, s, dim),
            _row_spec(g, s, dim),
            _row_spec(g, s, lse_lanes),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((bsz, s, lse_lanes), jnp.float32),
        ),
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(*args)


def _bwd_call(x, params, seed, u, lse, dy, *, heads, scale, kv_len, rate,
              interpret):
    bsz, s, dim = x.shape
    d = dim // heads
    mlp = params["w1"].shape[1]
    g = _group(bsz, s, dim, mlp, bwd=True)
    kernel = functools.partial(_bwd_kernel, heads=heads, d=d, scale=scale,
                               kv_len=kv_len, dropout_rate=rate)
    pt = _params_tuple(params)
    grad_shapes = tuple(
        jax.ShapeDtypeStruct(p.shape if p.ndim == 2 else (1, p.shape[-1]),
                             jnp.float32) for p in pt)
    grad_specs = tuple(
        _param_spec(sh.shape) for sh in grad_shapes)
    lse_lanes = lse.shape[-1]
    in_specs = [_row_spec(g, s, dim)] + _param_specs(params) \
        + [_row_spec(g, s, dim), _row_spec(g, s, lse_lanes),
           _row_spec(g, s, dim)]
    args = [x, *pt, u, lse, dy]
    if rate > 0.0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(seed)
    out = pl.pallas_call(
        kernel,
        grid=(bsz // g,),
        in_specs=in_specs,
        out_specs=(_row_spec(g, s, dim),) + grad_specs,
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),) + grad_shapes,
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(*args)
    dx, *dparams = out
    names = ("g1", "b1", "wqkv", "wo", "bo", "g2", "b2", "w1", "bb1",
             "w2", "bb2")
    grads = {}
    for name, p, dp in zip(names, pt, dparams):
        dp = dp if p.ndim == 2 else dp[0]
        grads[name] = dp.astype(p.dtype)
    return dx, grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fused_block(x, params, seed, heads, scale, kv_len, rate, interpret):
    y, _, _ = _fwd_call(x, params, seed, heads=heads, scale=scale,
                        kv_len=kv_len, rate=rate, interpret=interpret)
    return y


def _fused_fwd(x, params, seed, heads, scale, kv_len, rate, interpret):
    y, u, lse = _fwd_call(x, params, seed, heads=heads, scale=scale,
                          kv_len=kv_len, rate=rate, interpret=interpret)
    return y, (x, params, seed, u, lse)


def _fused_bwd(heads, scale, kv_len, rate, interpret, res, dy):
    x, params, seed, u, lse = res
    dx, grads = _bwd_call(x, params, seed, u, lse, dy, heads=heads,
                          scale=scale, kv_len=kv_len, rate=rate,
                          interpret=interpret)
    return dx, grads, jnp.zeros_like(seed)


_fused_block.defvjp(_fused_fwd, _fused_bwd)


def fused_vit_block(x, params, heads, scale, kv_len, interpret=False,
                    dropout_rate=0.0, dropout_rng=None):
    """One fused pre-norm ViT block.  x (B, S, D); params dict with
    g1/b1/wqkv/wo/bo/g2/b2/w1/bb1/w2/bb2.  S must be the (single) kv block;
    ``kv_len`` masks tile padding.

    ``dropout_rate`` > 0 (with a ``dropout_rng``) applies the reference's
    three block dropout sites (attention out-projection, FFN hidden, FFN
    output — src/models/vit.py:23,25,43) INSIDE the kernel via the
    hardware PRNG; the backward pass regenerates the identical masks.
    Statistically equivalent to the unfused path's nn.Dropout calls, not
    bit-equal (different RNG streams)."""
    rate = float(dropout_rate)
    if rate > 0.0:
        assert dropout_rng is not None, "dropout_rate > 0 needs a rng"
        seed = jax.random.randint(dropout_rng, (1,), 0, 2 ** 30,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    return _fused_block(x, params, seed, heads, scale, kv_len, rate,
                        interpret)


def reference_vit_block(x, params, heads, scale, kv_len):
    """Unfused reference implementation (testing / non-TPU fallback)."""
    x32 = x.astype(jnp.float32)
    a, _, _, _ = _ln(x32, params["g1"].astype(jnp.float32),
                     params["b1"].astype(jnp.float32))
    qkv = (a @ params["wqkv"].astype(jnp.float32))
    d = x.shape[-1] // heads
    att, _ = _mha_fwd(qkv, heads, d, scale, kv_len, jnp.float32)
    u = x32 + att @ params["wo"].astype(jnp.float32) \
        + params["bo"].astype(jnp.float32)
    b, _, _, _ = _ln(u, params["g2"].astype(jnp.float32),
                     params["b2"].astype(jnp.float32))
    h = _gelu(b @ params["w1"].astype(jnp.float32)
              + params["bb1"].astype(jnp.float32))
    y = u + h @ params["w2"].astype(jnp.float32) \
        + params["bb2"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Fused ATTENTION HALF: x + attn(LN1(x)) as one kernel per pass.
#
# For blocks whose FFN is not fusable into the same kernel — the MoE
# block (models/layers.MoEViTBlock), whose FFN is the routed switch MoE
# (parallel/moe.py) — the attention half still deserves the whole-block
# treatment: the round-5 overhead probes measured the unfused glue
# (separate LN/matmul HLOs around the attention kernel) at ~0.58
# ms/block fwd on the flagship shape, the single biggest share of the
# MoE path's overhead vs the dense fused step.  Math and residual
# layout are the first half of _fwd_kernel/_bwd_kernel verbatim
# (lse + mu1/rstd1 lanes); no dropout (the MoE surface runs
# dropout=0 — callers gate).
# ---------------------------------------------------------------------------


def _attn_half_fwd_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, wo_ref, bo_ref,
                          u_ref, res_ref,
                          *, heads: int, d: int, scale: float, kv_len: int):
    dtype = x_ref.dtype
    x = x_ref[...].astype(jnp.float32)                       # (G, S, D)
    a, _, mu1, rstd1 = _ln(x, g1_ref[0].astype(jnp.float32),
                           b1_ref[0].astype(jnp.float32))
    qkv = jax.lax.dot_general(
        a.astype(dtype), wqkv_ref[...].astype(dtype),
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    att, lse = _mha_fwd(qkv, heads, d, scale, kv_len, dtype)
    oproj = jax.lax.dot_general(
        att.astype(dtype), wo_ref[...].astype(dtype),
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32) \
        + bo_ref[0].astype(jnp.float32)
    u = x + oproj
    u_ref[...] = u.astype(u_ref.dtype)
    res = jnp.concatenate([lse, mu1, rstd1], axis=-1)
    res_ref[...] = jnp.pad(res, ((0, 0), (0, 0),
                                 (0, res_ref.shape[-1] - heads - 2)))


def _attn_half_bwd_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, wo_ref, bo_ref,
                          res_ref, du_ref,
                          dx_ref, dg1_ref, db1_ref, dwqkv_ref, dwo_ref,
                          dbo_ref,
                          *, heads: int, d: int, scale: float, kv_len: int):
    step = pl.program_id(0)
    dtype = x_ref.dtype

    @pl.when(step == 0)
    def _init():
        for ref in (dg1_ref, db1_ref, dwqkv_ref, dwo_ref, dbo_ref):
            ref[...] = jnp.zeros_like(ref)

    x = x_ref[...].astype(jnp.float32)
    du = du_ref[...].astype(jnp.float32)
    res = res_ref[...]
    lse = res[:, :, :heads]
    mu1, rstd1 = res[:, :, heads:heads + 1], res[:, :, heads + 1:heads + 2]
    g1 = g1_ref[0].astype(jnp.float32)

    xhat1 = (x - mu1) * rstd1
    a = xhat1 * g1 + b1_ref[0].astype(jnp.float32)
    qkv = jax.lax.dot_general(
        a.astype(dtype), wqkv_ref[...].astype(dtype),
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    def flat(t):
        return t.reshape(-1, t.shape[-1])

    datt = jax.lax.dot_general(
        du.astype(dtype), wo_ref[...].astype(dtype),
        (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    att, dqkv = _mha_fwd_bwd(qkv, lse, datt, heads, d, scale, kv_len, dtype)
    dwo_ref[...] += jax.lax.dot_general(
        flat(att).astype(dtype), flat(du).astype(dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbo_ref[...] += jnp.sum(du, axis=(0, 1))[None, :]

    da = jax.lax.dot_general(
        dqkv.astype(dtype), wqkv_ref[...].astype(dtype),
        (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dwqkv_ref[...] += jax.lax.dot_general(
        flat(a).astype(dtype), flat(dqkv).astype(dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dg1_ref[...] += jnp.sum(da * xhat1, axis=(0, 1))[None, :]
    db1_ref[...] += jnp.sum(da, axis=(0, 1))[None, :]
    dx = du + _ln_bwd(da * g1, xhat1, rstd1)
    dx_ref[...] = dx.astype(dx_ref.dtype)


_HALF_NAMES = ("g1", "b1", "wqkv", "wo", "bo")


def _half_tuple(params):
    return tuple(params[k] for k in _HALF_NAMES)


def _attn_half_fwd_call(x, params, *, heads, scale, kv_len, interpret):
    bsz, s, dim = x.shape
    d = dim // heads
    g = _group(bsz, s, dim, dim, bwd=False)
    res_lanes = _round_up(heads + 2, 8)
    kernel = functools.partial(_attn_half_fwd_kernel, heads=heads, d=d,
                               scale=scale, kv_len=kv_len)
    pt = _half_tuple(params)
    return pl.pallas_call(
        kernel,
        grid=(bsz // g,),
        in_specs=[_row_spec(g, s, dim)] + [_param_spec(p.shape)
                                           for p in pt],
        out_specs=(_row_spec(g, s, dim), _row_spec(g, s, res_lanes)),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((bsz, s, res_lanes), jnp.float32)),
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(x, *pt)


def _attn_half_bwd_call(x, params, res, du, *, heads, scale, kv_len,
                        interpret):
    bsz, s, dim = x.shape
    d = dim // heads
    g = _group(bsz, s, dim, dim, bwd=True)
    kernel = functools.partial(_attn_half_bwd_kernel, heads=heads, d=d,
                               scale=scale, kv_len=kv_len)
    pt = _half_tuple(params)
    grad_shapes = tuple(
        jax.ShapeDtypeStruct(p.shape if p.ndim == 2 else (1, p.shape[-1]),
                             jnp.float32) for p in pt)
    out = pl.pallas_call(
        kernel,
        grid=(bsz // g,),
        in_specs=[_row_spec(g, s, dim)]
        + [_param_spec(p.shape) for p in pt]
        + [_row_spec(g, s, res.shape[-1]), _row_spec(g, s, dim)],
        out_specs=(_row_spec(g, s, dim),)
        + tuple(_param_spec(sh.shape) for sh in grad_shapes),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),) + grad_shapes,
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(x, *pt, res, du)
    dx, *dparams = out
    grads = {}
    for name, p, dp in zip(_HALF_NAMES, pt, dparams):
        dp = dp if p.ndim == 2 else dp[0]
        grads[name] = dp.astype(p.dtype)
    return dx, grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _attn_half(x, params, heads, scale, kv_len, interpret):
    u, _ = _attn_half_fwd_call(x, params, heads=heads, scale=scale,
                               kv_len=kv_len, interpret=interpret)
    return u


def _attn_half_fwd(x, params, heads, scale, kv_len, interpret):
    u, res = _attn_half_fwd_call(x, params, heads=heads, scale=scale,
                                 kv_len=kv_len, interpret=interpret)
    return u, (x, params, res)


def _attn_half_bwd(heads, scale, kv_len, interpret, resid, du):
    x, params, res = resid
    dx, grads = _attn_half_bwd_call(x, params, res, du, heads=heads,
                                    scale=scale, kv_len=kv_len,
                                    interpret=interpret)
    return dx, grads


_attn_half.defvjp(_attn_half_fwd, _attn_half_bwd)


def fused_attn_half(x, params, heads, scale, kv_len, interpret=False):
    """``x + attn(LN1(x))`` as ONE Pallas kernel per pass.  x (B, S, D);
    params dict with g1/b1/wqkv/wo/bo (the attention half of the
    fused-block layout).  Single-kv-block sequences, no dropout —
    callers gate (models/layers.MoEViTBlock)."""
    return _attn_half(x, params, heads, scale, kv_len, interpret)
