"""Megatron-style tensor-parallel ViT block with per-device Pallas MHA.

The GSPMD tier (parallel/sharding.py partition rules under pjit) shards
any model's attention over the ``model`` axis, but a ``pallas_call`` is
opaque to GSPMD, so that tier traces jnp formulations
(ops/attention.pallas_disabled).  This module closes the remaining seam
for the transformer hot path: the same Megatron layout — qkv
column-sharded by head, out-projection row-sharded, FFN column/row-split
(Shoeybi et al., the public Megatron-LM partitioning; reference has no
TP at all, src/main.py:87-88 trains on one GPU) — expressed explicitly
inside ``jax.shard_map``, where per-device shapes are concrete and every
device runs the fused packed-qkv Pallas attention kernel
(ops/flash_attention.fused_mha) on its local heads.

Communication is exactly Megatron's: TWO psums per block in the forward
(after the attention out-projection partial and after the FFN second
matmul), which XLA lowers to all-reduces over ICI; the backward falls
out of ``jax.grad`` through shard_map (psum transposes to identity on
the replicated activations, the matmul transposes are local).

Parameter layout: :func:`tp_shard_block_params` splits the fused-block
param dict (ops/fused_block layout: g1/b1/wqkv/wo/bo/g2/b2/w1/bb1/w2/
bb2) into

  * ``rep``  — LN scales/offsets and the post-psum biases (bo, bb2),
    replicated (shard_map in_spec ``P()``);
  * ``shard`` — the four big matrices + the FFN hidden bias, stacked on
    a leading device axis (in_spec ``P(axis)``), each slice in the
    packed ``(3, H/n, D)`` column order ``fused_mha`` expects.

A training loop keeps the stacked tree sharded across steps (grads come
back in the same layout); :func:`tp_unshard_block_params` inverts the
split for interop/checkpoint-export, and works on gradient trees too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from devt_tpu.ops.flash_attention import fused_mha
from devt_tpu.ops.fused_block import _gelu, _ln

TP_AXIS = "model"

_REP_KEYS = ("g1", "b1", "g2", "b2", "bo", "bb2")
_SHARD_KEYS = ("wqkv", "wo", "w1", "bb1", "w2")


def tp_shard_block_params(params, n: int):
    """Split a fused-block param dict into (rep, stacked-shard) trees.

    ``wqkv`` (D, 3·H·d) columns are packed ``(3, H, d)``; slicing each of
    the q/k/v thirds into ``n`` equal chunks lands on head boundaries
    whenever ``H % n == 0``, and re-packing the chunk keeps the
    ``(3, H/n, d)`` order the fused kernel expects per device.
    """
    dim, f3 = params["wqkv"].shape
    hd = f3 // 3
    assert hd % n == 0, (f3, n)
    hdl = hd // n
    wqkv = params["wqkv"].reshape(dim, 3, hd)
    shard = {
        "wqkv": jnp.stack([
            wqkv[:, :, j * hdl:(j + 1) * hdl].reshape(dim, 3 * hdl)
            for j in range(n)]),
        "wo": jnp.stack(jnp.split(params["wo"], n, axis=0)),
        "w1": jnp.stack(jnp.split(params["w1"], n, axis=1)),
        # biases are (1, F) row vectors — the feature axis is the split
        "bb1": jnp.stack(jnp.split(params["bb1"], n, axis=-1)),
        "w2": jnp.stack(jnp.split(params["w2"], n, axis=0)),
    }
    rep = {k: params[k] for k in _REP_KEYS}
    return rep, shard


def tp_unshard_block_params(rep, shard):
    """Inverse of :func:`tp_shard_block_params` (also maps grad trees
    back to the full single-device layout)."""
    n, dim, f3l = shard["wqkv"].shape
    hdl = f3l // 3
    wqkv = jnp.concatenate(
        [shard["wqkv"][j].reshape(dim, 3, hdl) for j in range(n)], axis=2)
    out = dict(rep)
    out["wqkv"] = wqkv.reshape(dim, 3 * n * hdl)
    out["wo"] = jnp.concatenate(list(shard["wo"]), axis=0)
    out["w1"] = jnp.concatenate(list(shard["w1"]), axis=1)
    out["bb1"] = jnp.concatenate(list(shard["bb1"]), axis=-1)
    out["w2"] = jnp.concatenate(list(shard["w2"]), axis=0)
    return out


def _tp_block_local(x, rep, shard_local, seed, *, heads_local: int,
                    scale: float, kv_len: int, axis_name: str,
                    batch_axis_name: str | None, rate: float,
                    interpret: bool):
    """One device's slice of the block — call INSIDE shard_map.

    x (B, S, D) replicated; ``shard_local`` carries this device's stage
    of the stacked tree (leading extent 1).  The attention core is the
    fused packed-qkv Pallas kernel on the local ``heads_local`` heads.

    ``rate`` > 0 applies the reference's three block dropout sites
    (attention out-projection, FFN hidden, FFN output —
    src/models/vit.py:23,25,43): the out-proj and FFN-output masks are
    drawn post-psum from the replicated ``seed`` (identical on every
    device — the full-width tensors stay consistent), while the FFN
    hidden mask folds in the device's model-axis index, since that
    activation lives column-sharded.
    """
    w = jax.tree_util.tree_map(lambda t: t[0], shard_local)
    f32 = jnp.float32
    if rate > 0.0:
        base = jax.random.key(seed[0])
        if batch_axis_name is not None:
            # distinct masks per data shard (each shard holds different
            # samples) while devices WITHIN a shard — which carry the
            # same full-width tensors post-psum — stay mask-consistent
            base = jax.random.fold_in(
                base, jax.lax.axis_index(batch_axis_name))
        k1, k2, k3 = jax.random.split(base, 3)
        k2 = jax.random.fold_in(k2, jax.lax.axis_index(axis_name))

        def drop(k, t):
            keep = jax.random.bernoulli(k, 1.0 - rate, t.shape)
            return jnp.where(keep, t / (1.0 - rate), 0.0)
    x32 = x.astype(f32)
    a, _, _, _ = _ln(x32, rep["g1"].astype(f32), rep["b1"].astype(f32))
    qkv = jax.lax.dot_general(
        a.astype(x.dtype), w["wqkv"].astype(x.dtype),
        (((2,), (0,)), ((), ())), preferred_element_type=f32)
    att = fused_mha(qkv.astype(x.dtype), heads=heads_local, scale=scale,
                    kv_len=kv_len, interpret=interpret)
    part = jax.lax.dot_general(
        att.astype(x.dtype), w["wo"].astype(x.dtype),
        (((2,), (0,)), ((), ())), preferred_element_type=f32)
    oproj = jax.lax.psum(part, axis_name) + rep["bo"].astype(f32)
    if rate > 0.0:
        oproj = drop(k1, oproj)
    u = x32 + oproj
    h2, _, _, _ = _ln(u, rep["g2"].astype(f32), rep["b2"].astype(f32))
    z1 = jax.lax.dot_general(
        h2.astype(x.dtype), w["w1"].astype(x.dtype),
        (((2,), (0,)), ((), ())), preferred_element_type=f32) \
        + w["bb1"].astype(f32)
    h = _gelu(z1)
    if rate > 0.0:
        h = drop(k2, h)
    z2 = jax.lax.psum(jax.lax.dot_general(
        h.astype(x.dtype), w["w2"].astype(x.dtype),
        (((2,), (0,)), ((), ())), preferred_element_type=f32), axis_name) \
        + rep["bb2"].astype(f32)
    if rate > 0.0:
        z2 = drop(k3, z2)
    y = u + z2
    return y.astype(x.dtype)


def tp_vit_block_sharded(x, rep, shard, mesh: Mesh, *, heads: int,
                         scale: float | None = None,
                         kv_len: int | None = None, axis: str = TP_AXIS,
                         batch_axis: str | None = None,
                         dropout_rate: float = 0.0, dropout_rng=None,
                         interpret: bool = False):
    """Tensor-parallel block on pre-split params (the training layout:
    ``shard`` stays device-resident across steps; grads via ``jax.grad``
    come back stacked the same way).

    ``batch_axis`` composes DP×TP on a 2-axis mesh: the batch shards
    over it while heads/FFN shard over ``axis`` — each device runs the
    fused kernel on its (B/dp, S, local-heads) tile, and the psums still
    ride only the model axis.
    """
    n = mesh.shape[axis]
    b, s, dim = x.shape
    assert heads % n == 0, (heads, n)
    d = dim // heads
    rate = float(dropout_rate)
    if rate > 0.0:
        assert dropout_rng is not None, "dropout_rate > 0 needs a rng"
        seed = jax.random.randint(dropout_rng, (1,), 0, 2 ** 30,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    body = functools.partial(
        _tp_block_local, heads_local=heads // n,
        scale=d ** -0.5 if scale is None else scale,
        kv_len=s if kv_len is None else kv_len,
        axis_name=axis, batch_axis_name=batch_axis, rate=rate,
        interpret=interpret)
    rep_spec = jax.tree_util.tree_map(lambda _: P(), rep)
    shard_spec = jax.tree_util.tree_map(lambda _: P(axis), shard)
    x_spec = P(batch_axis) if batch_axis else P()
    # check_vma=False: the body calls pallas_call kernels, which carry no
    # varying-mesh-axes annotation (same waiver as the shard_map DP step,
    # parallel/train_step.py); the psums above make the output genuinely
    # replicated over the model axis, and the grad-parity tests verify
    # the transposes
    mapped = jax.shard_map(body, mesh=mesh,
                           in_specs=(x_spec, rep_spec, shard_spec, P()),
                           out_specs=x_spec, check_vma=False)
    return mapped(x, rep, shard, seed)


def tp_vit_block(x, params, mesh: Mesh, *, heads: int,
                 scale: float | None = None, kv_len: int | None = None,
                 axis: str = TP_AXIS, batch_axis: str | None = None,
                 dropout_rate: float = 0.0, dropout_rng=None,
                 interpret: bool = False):
    """Convenience wrapper from the full single-device param dict —
    splits every call.  Inside a GSPMD trace (the trainer's TP path,
    models/layers.ViTBlock under ``tp_pallas_scope``) the split lowers
    to cheap slice/stack HLOs that GSPMD reshards once per step; for
    hand-written loops prefer :func:`tp_vit_block_sharded`, which keeps
    the stacked layout resident."""
    rep, shard = tp_shard_block_params(params, mesh.shape[axis])
    return tp_vit_block_sharded(x, rep, shard, mesh, heads=heads,
                                scale=scale, kv_len=kv_len, axis=axis,
                                batch_axis=batch_axis,
                                dropout_rate=dropout_rate,
                                dropout_rng=dropout_rng,
                                interpret=interpret)
