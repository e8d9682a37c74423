"""Core building blocks shared across the model family.

All modules are flax.linen with batch-major layouts ``(B, S, D)`` — the
reference constantly rearranges between seq-major and batch-major because
torch's TransformerEncoder is seq-major (src/models/transformer.py:74-104);
here one layout is used throughout and only the weight-port utilities know
about torch's conventions.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from devt_tpu.ops.attention import packed_mha
from devt_tpu.ops.fused_block import fused_vit_block

# torch uses eps=1e-5 in LayerNorm; flax defaults to 1e-6.  Parity requires
# the torch value everywhere a reference module has a LayerNorm.
LN_EPS = 1e-5


def sinusoidal_positional_encoding(max_len: int, d_model: int,
                                   base: float = 1000.0,
                                   dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal PE table, shape (max_len, d_model).

    NOTE the default ``base=1000.0``: the reference uses ``log(1000.0)``
    — not the usual 10000.0 — in both of its PositionalEncoding modules
    (src/models/transformer.py:16-17, src/models/frame_transformer.py:25-26).
    That quirk is preserved for logit parity.
    """
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                       * (-math.log(base) / d_model))
    angles = position * div_term
    pe = jnp.zeros((max_len, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles[:, : d_model // 2]))
    return pe.astype(dtype)


class PositionalEncoding(nn.Module):
    """Add sinusoidal PE along the sequence axis, then dropout.

    Reference: src/models/transformer.py:10-25 (identical twin at
    src/models/frame_transformer.py:19-34).  Input (B, S, D); the table is
    a constant, not a parameter.
    """
    d_model: int
    dropout: float = 0.1
    max_len: int = 4
    base: float = 1000.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        pe = sinusoidal_positional_encoding(
            self.max_len, self.d_model, self.base, dtype=x.dtype)
        x = x + pe[: x.shape[1]][None, :, :]
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class FeedForward(nn.Module):
    """Linear→GELU→Dropout→Linear→Dropout (reference: src/models/vit.py:17-28)."""
    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class ViTAttention(nn.Module):
    """Multi-head attention, ViT flavour (reference: src/models/vit.py:30-58).

    Single fused qkv projection without bias; output projection (plus
    dropout) only when ``not (heads == 1 and dim_head == dim)`` —
    the reference's ``project_out`` condition (src/models/vit.py:34).
    The softmax itself runs through the dispatching kernel
    (flash on TPU, einsum elsewhere).
    """
    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    attention_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 kv_len: int | None = None):
        b, n, _ = x.shape
        inner_dim = self.dim_head * self.heads
        project_out = not (self.heads == 1 and self.dim_head == self.dim)

        qkv = nn.Dense(inner_dim * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        out = packed_mha(qkv, heads=self.heads,
                         scale=self.dim_head ** -0.5,
                         impl=self.attention_impl, kv_len=kv_len)

        if project_out:
            out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class _LNParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class _DenseParams(nn.Module):
    in_dim: int
    out_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_dim, self.out_dim))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_dim,)) if self.use_bias else None
        return kernel, bias


class _AttnParams(nn.Module):
    dim: int
    inner: int

    @nn.compact
    def __call__(self):
        wqkv, _ = _DenseParams(self.dim, 3 * self.inner, use_bias=False,
                               name="to_qkv")()
        wo, bo = _DenseParams(self.inner, self.dim, name="to_out")()
        return wqkv, wo, bo


class _FFParams(nn.Module):
    dim: int
    mlp_dim: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.dim, self.mlp_dim, name="fc1")()
        w2, b2 = _DenseParams(self.mlp_dim, self.dim, name="fc2")()
        return w1, b1, w2, b2


class ViTBlock(nn.Module):
    """One pre-norm layer: x += attn(norm(x)); x += ff(norm(x)).

    On a single-device TPU (single-kv-block sequence, inner_dim == dim)
    the whole block runs as ONE fused Pallas kernel per pass
    (devt_tpu/ops/fused_block.py) — every intermediate stays in VMEM,
    and training dropout runs in-kernel via the hardware PRNG.  The
    parameter tree is identical in both paths, so checkpoints are
    interchangeable.
    """
    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    attention_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def _fused_eligible(self, x, deterministic) -> bool:
        import jax as _jax

        if self.attention_impl == "xla":
            return False
        if self.dropout > 0.0 and not deterministic \
                and _jax.default_backend() != "tpu":
            # in-kernel dropout needs the hardware PRNG — interpret mode
            # (CPU) stays on the unfused nn.Dropout path
            return False
        if self.heads * self.dim_head != self.dim:
            return False
        # the reference's project_out rule skips attn/to_out when
        # heads==1 and dim_head==dim (src/models/vit.py:34); the fused
        # path always applies to_out, so that edge config must stay on
        # the unfused path to keep the parameter tree interchangeable.
        if self.heads == 1 and self.dim_head == self.dim:
            return False
        from devt_tpu.ops.flash_attention import fits_single_block
        if not fits_single_block(x.shape[1]) or x.shape[1] % 16:
            return False
        if self.attention_impl == "fused_interpret":
            return True
        # multi-device: pallas_call is opaque to GSPMD (sharded operands
        # cannot partition into the kernel), so "auto" keeps the unfused
        # path, which GSPMD shards with the Megatron rules
        from devt_tpu.ops.attention import _auto_pallas_ok
        return _auto_pallas_ok()

    def _tp_eligible(self, x, deterministic, mesh) -> bool:
        """Megatron shard_map path under a TP mesh (tp_pallas_scope):
        heads and the FFN hidden must split over the model axis.
        Training dropout is served in the shard_map body (the reference's
        three block sites, sharded-site masks folded per device)."""
        if self.attention_impl == "xla":
            return False
        if self.heads * self.dim_head != self.dim:
            return False
        if self.heads == 1 and self.dim_head == self.dim:
            return False
        from devt_tpu.parallel.mesh import MODEL_AXIS
        mp = dict(mesh.shape).get(MODEL_AXIS, 1)
        if mp <= 1 or self.heads % mp or self.mlp_dim % mp:
            return False
        from devt_tpu.ops.flash_attention import fits_single_block
        return fits_single_block(x.shape[1])

    def _block_params(self, cast):
        g1, b1 = _LNParams(self.dim, name="attn_norm")()
        wqkv, wo, bo = _AttnParams(self.dim, self.heads * self.dim_head,
                                   name="attn")()
        g2, b2 = _LNParams(self.dim, name="ff_norm")()
        w1, bb1, w2, bb2 = _FFParams(self.dim, self.mlp_dim, name="ff")()
        return {
            "g1": g1.reshape(1, -1), "b1": b1.reshape(1, -1),
            "wqkv": wqkv.astype(cast), "wo": wo.astype(cast),
            "bo": bo.reshape(1, -1),
            "g2": g2.reshape(1, -1), "b2": b2.reshape(1, -1),
            "w1": w1.astype(cast), "bb1": bb1.reshape(1, -1),
            "w2": w2.astype(cast), "bb2": bb2.reshape(1, -1),
        }

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 kv_len: int | None = None):
        from devt_tpu.ops.attention import active_tp_mesh, quant_active

        if deterministic and quant_active() \
                and not (self.heads == 1 and self.dim_head == self.dim):
            # int8 serving path (ops/quant.py): same param tree, big
            # matmuls int8 — set by serve.Predictor(quantize=True)
            import jax as _jax

            from devt_tpu.ops.quant import (quant_block_params,
                                            quant_vit_block)
            params = self._block_params(self.dtype)
            # honour the block's attention_impl: a config pinned to
            # 'xla' (cross-platform export prerequisite) must not trace
            # a pallas_call just because quantize=True is set
            impl = ("pallas" if self.attention_impl == "fused_interpret"
                    else self.attention_impl)
            return quant_vit_block(
                x.astype(self.dtype), quant_block_params(params),
                self.heads, self.dim_head ** -0.5,
                kv_len if kv_len is not None else x.shape[1],
                impl=impl,
                interpret=self.attention_impl == "fused_interpret"
                or _jax.default_backend() != "tpu")

        tpm = active_tp_mesh()
        if tpm is not None and self._tp_eligible(x, deterministic, tpm):
            import jax as _jax

            from devt_tpu.parallel import tp_block
            from devt_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

            params = self._block_params(self.dtype)
            shape = dict(tpm.shape)
            dp = shape.get(DATA_AXIS, 1)
            batch_axis = DATA_AXIS if dp > 1 and x.shape[0] % dp == 0 \
                else None
            train_dropout = self.dropout > 0.0 and not deterministic
            return tp_block.tp_vit_block(
                x.astype(self.dtype), params, tpm, heads=self.heads,
                scale=self.dim_head ** -0.5,
                kv_len=kv_len if kv_len is not None else x.shape[1],
                axis=MODEL_AXIS, batch_axis=batch_axis,
                dropout_rate=self.dropout if train_dropout else 0.0,
                dropout_rng=self.make_rng("dropout") if train_dropout
                else None,
                interpret=_jax.default_backend() != "tpu")
        if self._fused_eligible(x, deterministic):
            cast = self.dtype
            params = self._block_params(cast)
            train_dropout = self.dropout > 0.0 and not deterministic
            return fused_vit_block(
                x.astype(cast), params, self.heads,
                self.dim_head ** -0.5,
                kv_len if kv_len is not None else x.shape[1],
                self.attention_impl == "fused_interpret",
                dropout_rate=self.dropout if train_dropout else 0.0,
                dropout_rng=self.make_rng("dropout") if train_dropout
                else None)

        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                         name="attn_norm")(x)
        h = ViTAttention(self.dim, heads=self.heads, dim_head=self.dim_head,
                         dropout=self.dropout,
                         attention_impl=self.attention_impl,
                         dtype=self.dtype, name="attn")(
                             h, deterministic, kv_len)
        x = x + h
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ff_norm")(x)
        h = FeedForward(self.dim, self.mlp_dim, dropout=self.dropout,
                        dtype=self.dtype, name="ff")(
                            h, deterministic=deterministic)
        return x + h


class MoEViTBlock(nn.Module):
    """Pre-norm layer whose FFN is a top-1-routed switch MoE
    (parallel/moe.py): ``x += attn(norm(x)); x += moe(norm(x))``.

    Beyond parity — the reference has no MoE.  Routing/dispatch are the
    static-shape einsum formulation (every expert computes exactly C
    capacity slots; overflow tokens ride the residual), so the block jits
    with no data-dependent shapes.  The router's load-balance auxiliary
    loss is sown into the ``"losses"`` collection; train/steps.py adds it
    to the objective weighted by ``config.moe_aux_weight``.  The expert
    params carry a leading (E, …) axis under the ``moe`` scope, so an
    expert-parallel deployment shards them over the expert mesh axis and
    runs the identical math via ``parallel.moe.moe_ffn`` (parity tested).
    """
    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    n_experts: int
    capacity_factor: float = 1.25
    # eval uses a roomier queue so few tokens drop at inference (the
    # Switch-Transformer convention); train keeps the tight factor that
    # pressures the router toward balance
    eval_capacity_factor: float = 2.0
    dropout: float = 0.0
    attention_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def _fused_half_eligible(self, x, deterministic) -> bool:
        """Same gates as ViTBlock._fused_eligible minus dropout support
        (the fused attention half has none — training dropout keeps the
        unfused path)."""
        import jax as _jax

        if self.attention_impl == "xla":
            return False
        if self.dropout > 0.0 and not deterministic:
            return False
        if self.heads * self.dim_head != self.dim:
            return False
        if self.heads == 1 and self.dim_head == self.dim:
            return False
        from devt_tpu.ops.flash_attention import fits_single_block
        if not fits_single_block(x.shape[1]) or x.shape[1] % 16:
            return False
        if self.attention_impl == "fused_interpret":
            return True
        from devt_tpu.ops.attention import _auto_pallas_ok
        return _auto_pallas_ok()

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 kv_len: int | None = None):
        from devt_tpu.parallel.moe import moe_ffn_dense

        if self._fused_half_eligible(x, deterministic):
            # x + attn(LN1(x)) as ONE kernel per pass
            # (ops/fused_block.fused_attn_half) — the r5 probes priced
            # the unfused glue around the attention kernel as the
            # largest share of the MoE path's overhead vs the dense
            # fused step; the param declarations keep the tree
            # identical to the unfused branch below
            from devt_tpu.ops.fused_block import fused_attn_half

            g1, b1 = _LNParams(self.dim, name="attn_norm")()
            wqkv, wo, bo = _AttnParams(self.dim,
                                       self.heads * self.dim_head,
                                       name="attn")()
            hp = {"g1": g1.reshape(1, -1), "b1": b1.reshape(1, -1),
                  "wqkv": wqkv.astype(self.dtype),
                  "wo": wo.astype(self.dtype),
                  "bo": bo.reshape(1, -1)}
            x = fused_attn_half(
                x.astype(self.dtype), hp, self.heads,
                self.dim_head ** -0.5,
                kv_len if kv_len is not None else x.shape[1],
                interpret=self.attention_impl == "fused_interpret")
        else:
            h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                             name="attn_norm")(x)
            h = ViTAttention(self.dim, heads=self.heads,
                             dim_head=self.dim_head,
                             dropout=self.dropout,
                             attention_impl=self.attention_impl,
                             dtype=self.dtype, name="attn")(
                                 h, deterministic, kv_len)
            x = x + h
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ff_norm")(x)
        e, d, f = self.n_experts, self.dim, self.mlp_dim
        moe_params = {
            "router": self.param("moe_router",
                                 nn.initializers.normal(stddev=0.01),
                                 (d, e)),
            "w1": self.param("moe_w1", nn.initializers.lecun_normal(),
                             (e, d, f)),
            "b1": self.param("moe_b1", nn.initializers.zeros, (e, f)),
            "w2": self.param("moe_w2", nn.initializers.lecun_normal(),
                             (e, f, d)),
            "b2": self.param("moe_b2", nn.initializers.zeros, (e, d)),
        }
        # tile-alignment pad tokens (kv_len < S, models/vivit.py
        # _pad_tokens) must not consume expert capacity or skew the
        # load-balance statistics — mask them out of routing; their MoE
        # output is zero and the residual carries them unchanged
        valid2d = None
        if kv_len is not None and kv_len != h.shape[1]:
            valid2d = jnp.broadcast_to(
                (jnp.arange(h.shape[1]) < kv_len)[None], h.shape[:2])
        cf = (self.capacity_factor if not deterministic
              else max(self.capacity_factor, self.eval_capacity_factor))
        from devt_tpu.parallel.moe import active_moe_ep, moe_ffn_ep_rows
        ep = active_moe_ep()
        if (ep is not None and ep[1] > 1
                and self.n_experts % ep[1] == 0):
            # expert-parallel training (config.moe_ep): the body is
            # tracing inside the dp shard_map — per-row routing is
            # identical to the dense path below, but each device
            # computes only its E/n experts' FFNs on the global slot
            # batch (two all_to_alls over the data axis)
            y, aux = moe_ffn_ep_rows(moe_params, h, axis_name=ep[0],
                                     n_shards=ep[1],
                                     capacity_factor=cf, valid=valid2d)
        else:
            # route per sequence row: per-row capacity keeps the
            # dispatch tensor linear in batch size (the global
            # formulation is quadratic in total tokens and OOMs at real
            # batches — see moe_ffn_dense), and matches the per-shard
            # capacity the EP deployment path uses
            y, aux = moe_ffn_dense(
                moe_params, h.reshape(-1, d), capacity_factor=cf,
                valid=None if valid2d is None else valid2d.reshape(-1),
                group_size=h.shape[1])
            y = y.reshape(h.shape)
        self.sow("losses", "moe_aux", aux)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return x + y


class ViTTransformer(nn.Module):
    """Pre-norm residual transformer with trailing LayerNorm.

    Reference: src/models/vit.py:60-75 — ``x = attn(norm(x)) + x;
    x = ff(norm(x)) + x`` per layer, then a final norm.
    ``remat`` rematerialises each block on the backward pass.
    ``moe_experts > 0`` swaps every ``moe_every``-th layer's FFN for a
    switch MoE (so depth=4, moe_every=2 gives dense/moe/dense/moe — the
    standard interleaving).
    """
    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    attention_impl: str = "auto"
    remat: bool = False
    moe_experts: int = 0
    moe_every: int = 2
    moe_capacity_factor: float = 1.25
    # pipeline_stages > 1: the block stack's parameters are declared
    # STACKED — one (depth, ...) leaf per fused-block entry, names
    # "pb_*" — and the stack executes either sequentially (no pipe mesh)
    # or as the GPipe fill/drain schedule over the "pipe" mesh axis when
    # tracing inside parallel/train_step.py's pp shard_map
    # (parallel/pipeline.pipeline_scope).  Identical math either way —
    # the pp trainer's loss parity test rests on it.  NOTE: a different
    # param tree than the per-block named layout (checkpoints are not
    # interchangeable across pipeline_stages settings).
    pipeline_stages: int = 0
    pipeline_microbatches: int = 0
    # sequence_parallel: declare the SAME stacked pb_* layout as the pp
    # path (checkpoints interchangeable) and, when tracing inside an
    # sp_shard_map (config.sp > 1 — parallel/ring_attention.sp_scope),
    # run every block context-parallel over the "seq" mesh axis via the
    # kv ring.  Requires dropout == 0 and moe_experts == 0, like pp.
    sequence_parallel: bool = False
    dtype: jnp.dtype = jnp.float32

    def _stacked_block_params(self):
        import jax.nn.initializers as ji

        d, h, dd, m = self.dim, self.heads, self.dim_head, self.mlp_dim
        inner = h * dd
        lecun = ji.lecun_normal(in_axis=-2, out_axis=-1, batch_axis=(0,))
        n = self.depth

        def P_(name, init, *shape):
            return self.param(name, init, (n,) + shape)

        return {
            "g1": P_("pb_g1", ji.ones, 1, d),
            "b1": P_("pb_b1", ji.zeros, 1, d),
            "wqkv": P_("pb_wqkv", lecun, d, 3 * inner),
            "wo": P_("pb_wo", lecun, inner, d),
            "bo": P_("pb_bo", ji.zeros, 1, d),
            "g2": P_("pb_g2", ji.ones, 1, d),
            "b2": P_("pb_b2", ji.zeros, 1, d),
            "w1": P_("pb_w1", lecun, d, m),
            "bb1": P_("pb_bb1", ji.zeros, 1, m),
            "w2": P_("pb_w2", lecun, m, d),
            "bb2": P_("pb_bb2", ji.zeros, 1, d),
        }

    def _block_math(self, kv_len: int):
        """(params, x) -> y for one raw-param block — the fused Pallas
        kernel where it is eligible, the jnp reference math otherwise."""
        import jax as _jax

        from devt_tpu.ops.fused_block import (fused_vit_block,
                                              reference_vit_block)

        heads, scale = self.heads, self.dim_head ** -0.5
        interpret = self.attention_impl == "fused_interpret"
        use_fused = (interpret or (_jax.default_backend() == "tpu"
                                   and self.attention_impl != "xla")) \
            and self.heads * self.dim_head == self.dim

        def block(p, x):
            if use_fused and x.shape[1] % 16 == 0:
                from devt_tpu.ops.flash_attention import fits_single_block
                if fits_single_block(x.shape[1]):
                    return fused_vit_block(x, p, heads, scale, kv_len,
                                           interpret)
            return reference_vit_block(x, p, heads, scale, kv_len)

        return block

    def _stacked_cast(self):
        """Declare the stacked pb_* block params and apply the dtype
        convention: weight matrices (ndim 3 stacked: (depth, K, N))
        follow the model dtype, LN/bias rows stay f32."""
        import jax as _jax

        return _jax.tree_util.tree_map(
            lambda v: v.astype(self.dtype) if v.ndim == 3
            and v.shape[-2] > 1 else v, self._stacked_block_params())

    def _sp_stack(self, x, kv_len: int):
        """The sequence-parallel execution path (``sequence_parallel``,
        config.sp): the SAME stacked pb_* declaration as the pp layout
        (checkpoints are interchangeable between sp and pp runs), run
        sequentially depth-first — but inside an sp_shard_map trace
        (parallel/ring_attention.sp_scope) each device slices its token
        chunk and every block executes as the kv-ring context-parallel
        layer (`_ring_block_local`): LN/projections/FFN local to the
        chunk, K/V shards rotating over neighbour ICI.  Per-device
        activation memory is O(S/n).  No reference analogue (tiny
        sequences, src/config.yaml:3-4) — long-context scaling headroom
        with a product surface.
        """
        import jax as _jax

        from devt_tpu.parallel.ring_attention import (SEQ_AXIS,
                                                      _ring_block_local,
                                                      active_sp_mesh)

        stacked = self._stacked_cast()

        def take(tree, i):
            return _jax.tree_util.tree_map(lambda v: v[i], tree)

        mesh = active_sp_mesh()
        n = dict(mesh.shape).get(SEQ_AXIS, 1) if mesh is not None else 1
        if n <= 1:
            # no seq mesh: sequential execution of the same stacked tree
            block = self._block_math(kv_len)
            for i in range(self.depth):
                x = block(take(stacked, i), x)
            return x
        if self.heads * self.dim_head != self.dim:
            raise ValueError(
                f"sequence-parallel blocks need heads*dim_head == dim; "
                f"got dim={self.dim} heads={self.heads} "
                f"dim_head={self.dim_head}")
        s = x.shape[1]
        if s % n:
            raise ValueError(
                f"sp needs the (padded) token count divisible by the "
                f"seq axis; got {s} tokens over sp={n}")
        heads, scale = self.heads, self.dim_head ** -0.5
        idx = _jax.lax.axis_index(SEQ_AXIS)
        xs = _jax.lax.dynamic_slice_in_dim(x, idx * (s // n), s // n, 1)
        interpret = self.attention_impl == "fused_interpret"
        for j in range(self.depth):
            xs = _ring_block_local(xs, take(stacked, j), heads=heads,
                                   scale=scale, kv_len=kv_len,
                                   axis_name=SEQ_AXIS, n_shards=n,
                                   interpret=interpret)
        # hand every seq device the full sequence back (pooling and the
        # rest of the model run replicated); the all_gather transpose
        # carries the n× cotangent factor that makes the step body's
        # uniform seq-axis grad pmean exact (parallel/train_step.py)
        return _jax.lax.all_gather(xs, SEQ_AXIS, axis=1, tiled=True)

    def _pipelined_stack(self, x, kv_len: int):
        """The pipeline_stages > 1 execution path (see class note)."""
        import jax as _jax

        from devt_tpu.parallel.pipeline import (PIPE_AXIS, active_pipe_mesh,
                                                pipeline_apply)

        stacked = self._stacked_cast()
        block = self._block_math(kv_len)
        n_stages = self.pipeline_stages
        per = self.depth // n_stages

        def take(tree, i):
            return _jax.tree_util.tree_map(lambda v: v[i], tree)

        def stage_fn(p_stage, xs):
            # p_stage: one stage's (per, ...) slice; apply its blocks
            for j in range(per):
                xs = block(take(p_stage, j), xs)
            return xs

        mesh = active_pipe_mesh()
        if mesh is not None and dict(mesh.shape).get(PIPE_AXIS, 1) > 1:
            from devt_tpu.parallel.tp_block import TP_AXIS
            tp = dict(mesh.shape).get(TP_AXIS, 1)
            if tp > 1:
                # 3-D dp×pp×tp: each stage's blocks execute as the
                # Megatron TP slice over the model axis (every device
                # runs the fused Pallas MHA on its local heads, two
                # psums per block — parallel/tp_block._tp_block_local).
                # Params stay replicated; each device slices its model
                # shard locally, so checkpoints are layout-identical to
                # pp-only runs.  The train-step body reassembles the
                # sliced-weight grads with a model-axis psum
                # (parallel/train_step._make_step_body).
                stage_fn = self._tp_stage_fn(kv_len, tp, per, take)
            s_idx = _jax.lax.axis_index(PIPE_AXIS)
            local = _jax.tree_util.tree_map(
                lambda v: _jax.lax.dynamic_index_in_dim(
                    v.reshape((n_stages, per) + v.shape[1:]), s_idx, 0,
                    keepdims=False), stacked)
            n_micro = self.pipeline_microbatches or n_stages
            b = x.shape[0]
            assert b % n_micro == 0, (b, n_micro)
            xm = x.reshape((n_micro, b // n_micro) + x.shape[1:])
            out = pipeline_apply(stage_fn, local, xm,
                                 axis_name=PIPE_AXIS, n_stages=n_stages)
            return out.reshape(x.shape)
        # no pipe mesh: same stacked params, sequential execution
        for i in range(self.depth):
            x = block(take(stacked, i), x)
        return x

    def _tp_stage_fn(self, kv_len: int, tp: int, per: int, take):
        """pp×tp stage body: ``per`` Megatron-TP blocks over the model
        axis — call INSIDE the 3-D (data, pipe, model) shard_map.

        The full stage params are replicated across the model axis (the
        pp trainer's ``in_specs=P()`` state); each device carves out its
        head/FFN column slice with ``tp_shard_block_params`` + a local
        dynamic index, which XLA folds to cheap slices.  No reference
        analogue (single-GPU training, src/main.py:87-88) — this is the
        scaling surface for stacks too deep for one chip's HBM at a TP
        width the heads divide.
        """
        import jax as _jax

        from devt_tpu.ops.flash_attention import fits_single_block
        from devt_tpu.parallel.tp_block import (TP_AXIS, _tp_block_local,
                                                tp_shard_block_params)

        heads, scale = self.heads, self.dim_head ** -0.5
        if (self.heads * self.dim_head != self.dim or self.heads % tp
                or self.mlp_dim % tp):
            raise ValueError(
                f"pp x tp needs heads*dim_head == dim, heads % mp == 0 "
                f"and mlp_dim % mp == 0; got dim={self.dim} "
                f"heads={self.heads} dim_head={self.dim_head} "
                f"mlp_dim={self.mlp_dim} mp={tp}")
        interpret = self.attention_impl == "fused_interpret"
        if self.attention_impl == "xla" or (
                not interpret and _jax.default_backend() != "tpu"):
            raise ValueError(
                "pp x tp runs the fused Pallas MHA per device: use a TPU "
                "backend or attention_impl='fused_interpret'")
        seed = jnp.zeros((1,), jnp.int32)  # dropout == 0 on the pp path

        def stage_fn(p_stage, xs):
            if xs.shape[1] % 16 or not fits_single_block(xs.shape[1]):
                raise ValueError(
                    f"pp x tp stage needs a fused-eligible token count "
                    f"(16-aligned); got {xs.shape[1]}")
            m_idx = _jax.lax.axis_index(TP_AXIS)
            for j in range(per):
                rep, shard = tp_shard_block_params(take(p_stage, j), tp)
                shard_l = _jax.tree_util.tree_map(
                    lambda v: _jax.lax.dynamic_index_in_dim(
                        v, m_idx, 0, keepdims=True), shard)
                xs = _tp_block_local(
                    xs, rep, shard_l, seed, heads_local=heads // tp,
                    scale=scale, kv_len=kv_len, axis_name=TP_AXIS,
                    batch_axis_name=None, rate=0.0, interpret=interpret)
            return xs

        return stage_fn

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 kv_len: int | None = None):
        if self.pipeline_stages > 1:
            assert self.depth % self.pipeline_stages == 0, \
                (self.depth, self.pipeline_stages)
            assert self.moe_experts == 0 and self.dropout == 0.0, \
                "pp composes with dense dropout-free stacks (config.py)"
            y = self._pipelined_stack(
                x, kv_len if kv_len is not None else x.shape[1])
            return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                name="norm")(y)
        if self.sequence_parallel:
            assert self.moe_experts == 0 and self.dropout == 0.0, \
                "sp composes with dense dropout-free stacks (config.py)"
            y = self._sp_stack(
                x, kv_len if kv_len is not None else x.shape[1])
            return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                name="norm")(y)
        block_cls, moe_cls = ViTBlock, MoEViTBlock
        if self.remat:
            block_cls = nn.remat(ViTBlock, static_argnums=(2, 3))
            moe_cls = nn.remat(MoEViTBlock, static_argnums=(2, 3))
        for i in range(self.depth):
            if self.moe_experts > 0 and i % self.moe_every == \
                    self.moe_every - 1:
                x = moe_cls(self.dim, self.heads, self.dim_head,
                            self.mlp_dim, n_experts=self.moe_experts,
                            capacity_factor=self.moe_capacity_factor,
                            dropout=self.dropout,
                            attention_impl=self.attention_impl,
                            dtype=self.dtype, name=f"block_{i}")(
                                x, deterministic, kv_len)
            else:
                x = block_cls(self.dim, self.heads, self.dim_head,
                              self.mlp_dim, dropout=self.dropout,
                              attention_impl=self.attention_impl,
                              dtype=self.dtype, name=f"block_{i}")(
                                  x, deterministic, kv_len)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)


class GeluMlp(nn.Module):
    """Stack of Linear(+GELU between) layers.

    Covers the reference's MLP heads, e.g. 896→512→128→19 with GELU
    (src/models/frame_transformer.py:106).
    """
    features: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, name=f"fc{i}")(x)
            if i < len(self.features) - 1:
                x = nn.gelu(x, approximate=False)
        return x


class NormLinearHead(nn.Module):
    """LayerNorm + Linear head (reference: src/models/transformer.py:54,
    src/models/vit.py:104-107)."""
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
