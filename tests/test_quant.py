"""Int8 serving-path tests (ops/quant.py + serve.Predictor(quantize=True)).

The reference has no quantized inference; this is the beyond-parity
TPU-native serving tier.  The contract under test: a quantized Predictor
is checkpoint-compatible (same variables in) and its scores stay within
quantization error of the full-precision path — close enough that the
thresholded genre labels (the API the reference's callbacks expose,
src/callbacks/callbacks.py:59) almost always agree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devt_tpu.ops.quant import (int8_matmul, quant_block_params,
                                quant_vit_block, quantize_activation,
                                quantize_weight)


def test_quantize_weight_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((192, 576)) * 0.07, jnp.float32)
    w_q, s = quantize_weight(w)
    assert w_q.dtype == jnp.int8 and s.shape == (1, 576)
    deq = w_q.astype(jnp.float32) * s
    # symmetric rounding: per-element error ≤ half a quantization step
    assert float(jnp.max(jnp.abs(deq - w) - s / 2)) <= 1e-6


def test_quantize_activation_per_row():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 7, 64)), jnp.float32)
    x_q, s = quantize_activation(x)
    assert x_q.dtype == jnp.int8 and s.shape == (4, 7, 1)
    # the max-|x| element of every row quantizes to ±127 exactly
    assert int(jnp.min(jnp.max(jnp.abs(x_q), axis=-1))) == 127


def test_int8_matmul_close_to_f32():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 197, 192)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((192, 768)) * 0.05, jnp.float32)
    w_q, s = quantize_weight(w)
    out = jax.jit(int8_matmul)(x, w_q, s)
    ref = x @ w
    # int8×int8 keeps ~2 decimal digits on a K=192 contraction
    denom = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) / denom < 0.02


def _block_params(rng, dim, heads, dim_head, mlp):
    inner = heads * dim_head

    def P_(*shape, scale=0.05):
        return jnp.asarray(rng.standard_normal(shape) * scale,
                           jnp.float32)

    return {"g1": jnp.ones((1, dim)), "b1": jnp.zeros((1, dim)),
            "wqkv": P_(dim, 3 * inner), "wo": P_(inner, dim),
            "bo": jnp.zeros((1, dim)),
            "g2": jnp.ones((1, dim)), "b2": jnp.zeros((1, dim)),
            "w1": P_(dim, mlp), "bb1": jnp.zeros((1, mlp)),
            "w2": P_(mlp, dim), "bb2": jnp.zeros((1, dim))}


def test_quant_vit_block_matches_full_precision():
    from devt_tpu.ops.fused_block import fused_vit_block

    rng = np.random.default_rng(3)
    dim, heads, dhead, mlp = 192, 3, 64, 768
    params = _block_params(rng, dim, heads, dhead, mlp)
    x = jnp.asarray(rng.standard_normal((4, 208, dim)) * 0.3, jnp.float32)
    kv = 197

    q = jax.jit(lambda x: quant_vit_block(
        x, quant_block_params(params), heads, dhead ** -0.5, kv,
        interpret=True))(x)
    ref = jax.jit(lambda x: fused_vit_block(
        x, params, heads, dhead ** -0.5, kv, True))(x)
    ref = np.asarray(ref, np.float32)
    qn = np.asarray(q, np.float32)
    cos = float(np.sum(ref * qn)
                / (np.linalg.norm(ref) * np.linalg.norm(qn)))
    assert cos > 0.999
    assert float(np.max(np.abs(qn - ref))) < 0.15 * float(
        np.max(np.abs(ref)))


def test_quant_fused_kernel_matches_xla_quant_path():
    """The fused int8 kernel (quantize-in-VMEM, one pallas_call per
    block) against the unfused XLA int8 path (impl='xla'): both quantize
    identically, so they agree to LSB-level rounding — far tighter than
    the int8-vs-f32 budget."""
    from devt_tpu.ops.quant import _fused_quant_ok, quant_fused_vit_block

    rng = np.random.default_rng(7)
    dim, heads, dhead, mlp = 192, 3, 64, 768
    params = _block_params(rng, dim, heads, dhead, mlp)
    qp = quant_block_params(params)
    x = jnp.asarray(rng.standard_normal((4, 208, dim)) * 0.3, jnp.float32)
    assert _fused_quant_ok(x, qp, heads)

    fused = jax.jit(lambda x: quant_fused_vit_block(
        x, qp, heads, dhead ** -0.5, 197, interpret=True))(x)
    xla = jax.jit(lambda x: quant_vit_block(
        x, qp, heads, dhead ** -0.5, 197, impl="xla"))(x)
    f = np.asarray(fused, np.float32)
    r = np.asarray(xla, np.float32)
    # differences: reciprocal-vs-divide rounding in the row quantize and
    # the attention core's dispatch — both LSB-scale
    assert float(np.max(np.abs(f - r))) < 0.02 * float(np.max(np.abs(r)))


def test_quant_vit_block_routes_to_fused_kernel(monkeypatch):
    """impl != 'xla' on an eligible shape must take the fused kernel;
    impl='xla' must not."""
    from devt_tpu.ops import quant as quant_mod

    calls = []
    real = quant_mod.quant_fused_vit_block

    def spy(*a, **kw):
        calls.append(True)
        return real(*a, **kw)

    monkeypatch.setattr(quant_mod, "quant_fused_vit_block", spy)
    rng = np.random.default_rng(8)
    params = _block_params(rng, 192, 3, 64, 768)
    qp = quant_block_params(params)
    x = jnp.asarray(rng.standard_normal((2, 32, 192)) * 0.3, jnp.float32)
    quant_mod.quant_vit_block(x, qp, 3, 64 ** -0.5, 32, interpret=True)
    assert calls
    calls.clear()
    quant_mod.quant_vit_block(x, qp, 3, 64 ** -0.5, 32, impl="xla")
    assert not calls


def test_int8_matmul_fused_matches_xla_int8_path():
    """The wide-Dense Pallas kernel (quantize-in-VMEM + int8 MXU dot)
    against the plain XLA int8 formulation: same quantization scheme
    modulo reciprocal-vs-divide rounding, so near-LSB agreement —
    including a non-tile-multiple row count (padding path)."""
    from devt_tpu.ops.quant import int8_matmul_fused

    rng = np.random.default_rng(9)
    for m, k, n in ((256, 512, 512), (100, 512, 768)):
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)
        w_q, s = quantize_weight(w)
        fused = jax.jit(lambda x, wq=w_q, ss=s: int8_matmul_fused(
            x, wq, ss, interpret=True))(x)
        ref = jax.jit(int8_matmul)(x, w_q, s)
        denom = float(jnp.max(jnp.abs(ref)))
        assert fused.shape == (m, n)
        assert float(jnp.max(jnp.abs(fused - ref))) / denom < 1e-3


def test_int8_dot_general_routes_by_shape(monkeypatch):
    """int8_dot_general takes the fused Pallas kernel exactly when the
    shape regime wins (wide contraction, TPU backend) — narrow shapes
    and non-TPU backends keep the XLA formulation."""
    from devt_tpu.ops import quant as quant_mod

    # on the CPU test backend the gate must refuse outright
    assert not quant_mod._fused_matmul_ok(4096, 2048, 2048)
    # pretend-TPU: check the shape rule itself
    monkeypatch.setattr("jax.default_backend", lambda: "tpu")
    assert quant_mod._fused_matmul_ok(4096, 2048, 2048)
    assert not quant_mod._fused_matmul_ok(4096, 192, 576)   # narrow K
    assert not quant_mod._fused_matmul_ok(16, 2048, 2048)   # tiny batch
    from devt_tpu.ops.attention import pallas_disabled
    with pallas_disabled():   # GSPMD trace: no pallas_call
        assert not quant_mod._fused_matmul_ok(4096, 2048, 2048)


def test_quant_vit_block_wider_inner_dim():
    """inner = heads·dim_head ≠ dim exercises the (inner, dim)
    out-projection shape inference."""
    rng = np.random.default_rng(4)
    dim, heads, dhead, mlp = 96, 4, 48, 256
    params = _block_params(rng, dim, heads, dhead, mlp)
    x = jnp.asarray(rng.standard_normal((2, 32, dim)) * 0.3, jnp.float32)
    out = jax.jit(lambda x: quant_vit_block(
        x, quant_block_params(params), heads, dhead ** -0.5, 32,
        interpret=True))(x)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_int8_dot_general_dense_site():
    """flax Dense(dot_general=int8_dot_general) — same params, int8
    contraction — tracks the full-precision Dense."""
    import flax.linen as nn

    from devt_tpu.ops.quant import int8_dot_general

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((6, 14, 512)), jnp.float32)
    full = nn.Dense(256)
    variables = full.init(jax.random.PRNGKey(0), x)
    ref = full.apply(variables, x)
    out = nn.Dense(256, dot_general=int8_dot_general).apply(variables, x)
    denom = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) / denom < 0.02


def test_torch_encoder_quant_scope_tracks_full_precision():
    """The PTN/frame-transformer encoder stack (torch semantics) under
    quant_scope: all four Dense sites go int8, output stays close."""
    from devt_tpu.models.torch_encoder import TorchTransformerEncoder
    from devt_tpu.ops.attention import quant_scope

    rng = np.random.default_rng(6)
    enc = TorchTransformerEncoder(d_model=256, nhead=8,
                                  dim_feedforward=512, num_layers=2,
                                  dropout=0.0, attention_impl="xla")
    x = jnp.asarray(rng.standard_normal((4, 14, 256)) * 0.5, jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(enc.apply(variables, x, deterministic=True))
    with quant_scope():
        q = np.asarray(enc.apply(variables, x, deterministic=True))
    cos = float(np.sum(ref * q)
                / (np.linalg.norm(ref) * np.linalg.norm(q)))
    assert cos > 0.999
    # training mode must NOT quantize (the backward path is undefined):
    # deterministic=False with dropout 0 is numerically the full path
    with quant_scope():
        t = np.asarray(enc.apply(variables, x, deterministic=False,
                                 rngs={"dropout": jax.random.PRNGKey(1)}))
    np.testing.assert_allclose(t, ref, atol=1e-5)


@pytest.mark.slow
def test_predictor_quantize_arg_mode_matches_fold_mode(monkeypatch):
    """Big param trees must not bake into the HLO as literals: above
    FOLD_MODE_MAX_BYTES the quantized Predictor pre-quantizes each site
    once (eager collect pass) and serves them as jit ARGUMENTS.  Forced
    here by dropping the threshold to zero on a small PTN: scores must
    match the fold-mode predictor exactly (same weights, same site
    order), and the site list must be int8."""
    from devt_tpu import serve as serve_mod
    from devt_tpu.config import Config
    from devt_tpu.registry import build_model, example_batch
    from devt_tpu.serve import Predictor

    cfg = Config(model="ptn", batch_size=4, seq_len=6, nlayers=1,
                 experts=("video-embeddings", "audio-embeddings"))
    model = build_model(cfg)
    batch = example_batch(cfg, batch_size=4)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(batch["experts"]))
    # the 2048-wide PTN tree is ~200 MB — arg mode engages by default
    arg = Predictor(cfg, variables, buckets=(4,), quantize=True)
    monkeypatch.setattr(serve_mod, "FOLD_MODE_MAX_BYTES", 1 << 40)
    fold = Predictor(cfg, variables, buckets=(4,), quantize=True)
    assert fold._qsites is None
    assert arg._qsites, "arg mode did not collect any quant sites"
    assert all(q.dtype == jnp.int8 for q, _ in arg._qsites)
    req = {"experts": np.asarray(batch["experts"])}
    s_fold = fold.predict(req)["scores"]
    s_arg = arg.predict(req)["scores"]
    np.testing.assert_allclose(s_arg, s_fold, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_predictor_quantize_ptn():
    """PTN serving (2048-wide torch encoders — the family where int8's
    2x MXU rate bites hardest) quantized vs full precision."""
    from devt_tpu.config import Config
    from devt_tpu.registry import build_model, example_batch
    from devt_tpu.serve import Predictor

    cfg = Config(model="ptn", batch_size=4, seq_len=6, nlayers=1,
                 experts=("video-embeddings", "audio-embeddings"))
    model = build_model(cfg)
    batch = example_batch(cfg, batch_size=4)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(batch["experts"]))
    full = Predictor(cfg, variables, buckets=(4,))
    quant = Predictor(cfg, variables, buckets=(4,), quantize=True)
    req = {"experts": np.asarray(batch["experts"])}
    s_full = full.predict(req)["scores"]
    s_quant = quant.predict(req)["scores"]
    cos = float(np.sum(s_full * s_quant)
                / (np.linalg.norm(s_full) * np.linalg.norm(s_quant)))
    # random-init is the worst case for int8 (no dominant signal
    # direction, so quantization noise is a larger fraction of the
    # output than on any trained network); measured cos ≈ 0.990 here
    assert cos > 0.98
    assert float(np.max(np.abs(s_full - s_quant))) < 0.08


@pytest.mark.slow
def test_predictor_quantize_matches_full():
    """End to end: ViViT Predictor(quantize=True) scores track the
    full-precision Predictor from the SAME variables."""
    from devt_tpu.config import Config
    from devt_tpu.registry import build_model, example_batch
    from devt_tpu.serve import Predictor

    cfg = Config(model="vivit", batch_size=4, frame_len=4, n_classes=19)
    model = build_model(cfg)
    batch = example_batch(cfg, batch_size=4)
    vid = jnp.asarray(batch["vid"])
    variables = model.init({"params": jax.random.PRNGKey(0)}, vid)

    full = Predictor(cfg, variables, buckets=(4,))
    quant = Predictor(cfg, variables, buckets=(4,), quantize=True)
    req = {"vid": np.asarray(batch["vid"])}
    s_full = full.predict(req)["scores"]
    s_quant = quant.predict(req)["scores"]
    assert s_quant.shape == s_full.shape
    cos = float(np.sum(s_full * s_quant)
                / (np.linalg.norm(s_full) * np.linalg.norm(s_quant)))
    assert cos > 0.995
    assert float(np.max(np.abs(s_full - s_quant))) < 0.05


def test_quant_block_honours_pinned_attention_impl(monkeypatch):
    """A config pinned to attention_impl='xla' (the cross-platform export
    prerequisite, serve.Predictor.export) must reach the attention
    dispatcher with impl='xla' even under quantize=True — a pallas_call
    traced here would silently make the artifact TPU-only (ADVICE r3)."""
    from devt_tpu.models.layers import ViTBlock
    from devt_tpu.ops import attention as attn_mod
    from devt_tpu.ops import quant as quant_mod

    seen = {}
    real = attn_mod.scaled_dot_product_attention

    def spy(q, k, v, **kw):
        seen["impl"] = kw.get("impl", "auto")
        return real(q, k, v, **kw)

    monkeypatch.setattr(attn_mod, "scaled_dot_product_attention", spy)

    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 16, 64)),
                    jnp.float32)
    block = ViTBlock(64, 2, 32, 128, attention_impl="xla")
    variables = block.init(jax.random.PRNGKey(0), x)
    with attn_mod.quant_scope():
        out = block.apply(variables, x, deterministic=True)
    assert seen["impl"] == "xla"
    assert np.isfinite(np.asarray(out)).all()


def test_site_pred_freezes_rejected_sites():
    """quant_scope(site_pred) (round-5 Amdahl accounting hook): sites
    the predicate rejects run the EXACT bf16/f32 contraction, accepted
    sites quantize.  The Predictor's default policy n >= 2k was set by
    the chip ablation (square sites are measured int8 losers)."""
    import numpy as np

    from devt_tpu.ops.attention import quant_scope
    from devt_tpu.ops.quant import int8_dot_general

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    w_sq = jnp.asarray(rng.standard_normal((32, 32)), jnp.float32)
    w_wide = jnp.asarray(rng.standard_normal((32, 64)), jnp.float32)
    dn = (((1,), (0,)), ((), ()))

    policy = lambda k, n: n >= 2 * k            # the Predictor default
    with quant_scope(policy):
        out_sq = int8_dot_general(x, w_sq, dn)
        out_wide = int8_dot_general(x, w_wide, dn)
    # rejected square site: bit-identical to the plain contraction
    np.testing.assert_array_equal(np.asarray(out_sq),
                                  np.asarray(x @ w_sq))
    # accepted wide site: quantization rounding present but small
    err = np.abs(np.asarray(out_wide) - np.asarray(x @ w_wide))
    assert 0 < err.max() < 0.3, err.max()
