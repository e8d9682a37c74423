"""Speed-of-light probes for the MoE and TP overheads (r4 verdict #6).

In-graph ablations in the round-2 style: each variant swaps ONE piece of
the real path for a free/stub version, timed on the chip, so the
per-component cost falls out of differences between whole-program
timings (standalone microbenches do not transfer — NOTES "Measurement
gotchas").

    python tools/probe_overheads.py moe    # router / dispatch / capacity
    python tools/probe_overheads.py tp     # glue / shard_map / layout

Results land in stdout as JSON lines; the conclusions live in
NOTES_NEXT_ROUND.md ("Round-5 log" speed-of-light sections).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))          # repo root (script lives in tools/)

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out) -> float:
    """Host readback of ONE scalar — indexing happens on device, so the
    sync transfers 4 bytes, not the whole result (an np.asarray of an
    81 MB grad over the ~37 MB/s tunnel poisoned the first probe run
    by ~200 ms/call)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.reshape(-1)[0])


def _time(fn, *args, iters: int = 20, windows: int = 3) -> float:
    """best-of-windows ms per call, synced by scalar host readback."""
    _sync(fn(*args))
    best = 1e9
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


# ---------------------------------------------------------------------------
# MoE: moe_vivit_train ships +10 ms over dense (29.1 vs 19.1 ms).  The
# MoE surface per swapped layer is moe_ffn_dense per sequence row
# (group_size=tokens).  Decompose fwd+bwd of the MoE FFN itself at the
# exact flagship shapes: B*T=512 rows x 208 tokens x 192d, E=4,
# hidden 768, capacity_factor 1.25.
# ---------------------------------------------------------------------------


def probe_moe() -> None:
    from devt_tpu.parallel.moe import (_expert_ffn, init_moe_params,
                                       moe_ffn_dense, switch_route)

    E, D, H, G, S = 4, 192, 768, 512, 208
    params = init_moe_params(jax.random.PRNGKey(0), E, D, H)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (G * S, D)) * 0.3, jnp.bfloat16)
    capacity = max(int(S / E * 1.25), 1)

    def loss_of(fn):
        def loss(x):
            y, aux = fn(x)
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6 + 0.01 * aux
        return jax.jit(jax.grad(loss))

    # A: the real path (router + dispatch + experts + combine, grouped)
    full = loss_of(lambda x: moe_ffn_dense(params, x, 1.25, group_size=S))

    # B: dense-FFN twin — ONE expert's FFN on every token (identical
    # per-token FLOPs to the ideal MoE, zero routing machinery)
    def dense_twin(x):
        p1 = {"w1": params["w1"][:1], "b1": params["b1"][:1],
              "w2": params["w2"][:1], "b2": params["b2"][:1]}
        y = _expert_ffn(p1, x[None].reshape(1, -1, D))
        return y.reshape(-1, D), jnp.float32(0)
    dense = loss_of(dense_twin)

    # C: frozen routing — dispatch/combine/experts run exactly as in A,
    # but the router outputs are precomputed constants (router einsum,
    # softmax, cumsum queue machinery all gone).  A - C = routing cost.
    def routed(x):
        xs = x.reshape(G, S, D)

        def one(xg):
            dispatch, combine, aux = switch_route(
                xg, params["router"], E, capacity)
            return dispatch, combine, aux
        return jax.vmap(one)(xs)
    d_const, c_const, _ = jax.jit(routed)(x)
    d_const = jax.lax.stop_gradient(d_const)
    c_const = jax.lax.stop_gradient(c_const)

    def frozen_route(x):
        xs = x.reshape(G, S, D)

        def one(xg, dispatch, combine):
            slots = jnp.einsum("tec,td->ecd", dispatch.astype(xg.dtype),
                               xg)
            out = _expert_ffn(params, slots)
            return jnp.einsum("tec,ecd->td", combine.astype(xg.dtype),
                              out)
        y = jax.vmap(one)(xs, d_const, c_const)
        return y.reshape(-1, D), jnp.float32(0)
    frozen = loss_of(frozen_route)

    # D: capacity 1.0 vs 1.25 — the padding share of the expert compute
    full_c1 = loss_of(lambda x: moe_ffn_dense(params, x, 1.0,
                                              group_size=S))

    ms = {"full_cf1.25": _time(full, x), "dense_twin": _time(dense, x),
          "frozen_routing": _time(frozen, x),
          "full_cf1.0": _time(full_c1, x)}
    ms["routing_cost"] = ms["full_cf1.25"] - ms["frozen_routing"]
    ms["dispatch_and_padding_cost"] = ms["frozen_routing"] - ms["dense_twin"]
    ms["capacity_padding_cost"] = ms["full_cf1.25"] - ms["full_cf1.0"]
    print(json.dumps({"probe": "moe_ffn fwd+bwd (512x208 tokens, E=4)",
                      "ms": {k: round(v, 3) for k, v in ms.items()}}))


# ---------------------------------------------------------------------------
# TP block at mp=1: 2.03 vs 1.63 ms fused.  Decompose the +0.4 ms into
# (a) unfused glue (jnp LN/matmuls + fused_mha vs ONE whole-block
# kernel), (b) shard_map wrapping, (c) stacked-param slicing layout.
# ---------------------------------------------------------------------------


def probe_tp(n_chain: int = 50) -> None:
    from jax.sharding import Mesh, PartitionSpec as P

    from devt_tpu.ops.flash_attention import fused_mha
    from devt_tpu.ops.fused_block import fused_vit_block, _gelu, _ln
    from devt_tpu.parallel.tp_block import tp_vit_block

    dim, heads, dhead, mlp, s, kv, b = 192, 3, 64, 768, 208, 197, 512
    rng = np.random.default_rng(0)

    def P_(*shape, scale=0.05):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    params = {"g1": jnp.ones((1, dim)), "b1": jnp.zeros((1, dim)),
              "wqkv": P_(dim, 3 * dim), "wo": P_(dim, dim),
              "bo": jnp.zeros((1, dim)),
              "g2": jnp.ones((1, dim)), "b2": jnp.zeros((1, dim)),
              "w1": P_(dim, mlp), "bb1": jnp.zeros((1, mlp)),
              "w2": P_(mlp, dim), "bb2": jnp.zeros((1, dim))}
    x = jnp.asarray(rng.standard_normal((b, s, dim)) * 0.3, jnp.bfloat16)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("model",))
    scale = dhead ** -0.5
    f32 = jnp.float32

    def glue_block(h):
        """The TP body's math WITHOUT shard_map or param slicing: jnp
        LN + model-dtype matmuls + fused_mha kernel."""
        x32 = h.astype(f32)
        a, _, _, _ = _ln(x32, params["g1"].astype(f32),
                         params["b1"].astype(f32))
        qkv = jax.lax.dot_general(
            a.astype(h.dtype), params["wqkv"].astype(h.dtype),
            (((2,), (0,)), ((), ())), preferred_element_type=f32)
        att = fused_mha(qkv.astype(h.dtype), heads=heads, scale=scale,
                        kv_len=kv)
        u = x32 + jax.lax.dot_general(
            att.astype(h.dtype), params["wo"].astype(h.dtype),
            (((2,), (0,)), ((), ())), preferred_element_type=f32) \
            + params["bo"].astype(f32)
        h2, _, _, _ = _ln(u, params["g2"].astype(f32),
                          params["b2"].astype(f32))
        ff = _gelu(jax.lax.dot_general(
            h2.astype(h.dtype), params["w1"].astype(h.dtype),
            (((2,), (0,)), ((), ())), preferred_element_type=f32)
            + params["bb1"].astype(f32))
        y = u + jax.lax.dot_general(
            ff.astype(h.dtype), params["w2"].astype(h.dtype),
            (((2,), (0,)), ((), ())), preferred_element_type=f32) \
            + params["bb2"].astype(f32)
        return y.astype(h.dtype)

    def glue_shard_map(h):
        """Same body inside a 1-device shard_map (batch sharded spec —
        a no-op partition) — isolates the shard_map wrapping cost."""
        pspec = jax.tree_util.tree_map(lambda _: P(), params)
        return jax.shard_map(
            lambda hh, pp: glue_block(hh), mesh=mesh,
            in_specs=(P(), pspec), out_specs=P(),
            check_vma=False)(h, params)

    def chain(block):
        @jax.jit
        def fn(h):
            for _ in range(n_chain):
                h = block(h)
            return h
        return fn

    ms = {
        "fused_block": _time(chain(lambda h: fused_vit_block(
            h, params, heads, scale, kv)), x, iters=1),
        "glue_nomap": _time(chain(glue_block), x, iters=1),
        "glue_shard_map1": _time(chain(glue_shard_map), x, iters=1),
        "tp_block_mp1": _time(chain(lambda h: tp_vit_block(
            h, params, mesh, heads=heads, scale=scale, kv_len=kv)), x,
            iters=1),
    }
    ms = {k: v / n_chain for k, v in ms.items()}
    ms["unfused_glue_cost"] = ms["glue_nomap"] - ms["fused_block"]
    ms["shard_map_cost"] = ms["glue_shard_map1"] - ms["glue_nomap"]
    ms["layout_slicing_cost"] = ms["tp_block_mp1"] - ms["glue_shard_map1"]
    print(json.dumps({"probe": f"tp block fwd (b{b} s{s} d{dim}), "
                               f"ms/block over {n_chain}-chain",
                      "ms": {k: round(v, 4) for k, v in ms.items()}}))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("moe", "all"):
        probe_moe()
    if which in ("tp", "all"):
        probe_tp()
