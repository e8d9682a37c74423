"""Convert ViViT checkpoints between the standard and pipeline layouts.

``config.pp > 1`` declares the space transformer's blocks STACKED — one
``(depth, ...)`` leaf per fused-block entry (``pb_*``,
models/layers.py:ViTTransformer._stacked_block_params) — so a tree
trained with ``pp=N`` cannot load into a ``pp=1`` model or vice versa.
The two layouts carry identical information; this module moves between
them losslessly:

  standard (per-block modules)              stacked (pp)
  block_i/attn_norm/{scale,bias}   (D,)  ↔  pb_g1 / pb_b1   (depth, 1, D)
  block_i/attn/to_qkv/kernel              ↔  pb_wqkv         (depth, D, 3I)
  block_i/attn/to_out/{kernel,bias}       ↔  pb_wo / pb_bo
  block_i/ff_norm/{scale,bias}            ↔  pb_g2 / pb_b2
  block_i/ff/fc1/{kernel,bias}            ↔  pb_w1 / pb_bb1
  block_i/ff/fc2/{kernel,bias}            ↔  pb_w2 / pb_bb2

The final ``norm`` LayerNorm and everything outside ``space_transformer``
are layout-independent and pass through untouched.  Round-trip and
output-equality are pinned by tests/test_pipeline.py.

CLI (Orbax checkpoint → converted Orbax checkpoint):

    python -m devt_tpu.tools.convert_pp --src ck/step_100 --dst ck_pp \
        [--to standard|stacked]
"""

from __future__ import annotations

import numpy as np

# (stacked leaf, standard path inside block_i, add leading (1,) row?)
_LAYOUT = [
    ("pb_g1", ("attn_norm", "scale"), True),
    ("pb_b1", ("attn_norm", "bias"), True),
    ("pb_wqkv", ("attn", "to_qkv", "kernel"), False),
    ("pb_wo", ("attn", "to_out", "kernel"), False),
    ("pb_bo", ("attn", "to_out", "bias"), True),
    ("pb_g2", ("ff_norm", "scale"), True),
    ("pb_b2", ("ff_norm", "bias"), True),
    ("pb_w1", ("ff", "fc1", "kernel"), False),
    ("pb_bb1", ("ff", "fc1", "bias"), True),
    ("pb_w2", ("ff", "fc2", "kernel"), False),
    ("pb_bb2", ("ff", "fc2", "bias"), True),
]


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def stack_block_params(space: dict) -> dict:
    """Standard per-block ``block_i`` modules → stacked ``pb_*`` leaves.

    ``space`` is the ``space_transformer`` subtree; returns a new subtree
    (``norm`` and any non-block entries carried over).
    """
    blocks = sorted((k for k in space if k.startswith("block_")),
                    key=lambda k: int(k.split("_")[1]))
    if not blocks:
        raise ValueError("no block_i modules — already stacked?")
    out = {k: v for k, v in space.items() if not k.startswith("block_")}
    for name, path, add_row in _LAYOUT:
        leaves = [np.asarray(_get(space[b], path)) for b in blocks]
        if add_row:
            leaves = [v.reshape(1, -1) for v in leaves]
        out[name] = np.stack(leaves, axis=0)
    return out


def unstack_block_params(space: dict) -> dict:
    """Stacked ``pb_*`` leaves → standard per-block ``block_i`` modules."""
    if "pb_wqkv" not in space:
        raise ValueError("no pb_* leaves — already standard?")
    depth = np.asarray(space["pb_wqkv"]).shape[0]
    out = {k: v for k, v in space.items() if not k.startswith("pb_")}
    for i in range(depth):
        blk: dict = {}
        for name, path, add_row in _LAYOUT:
            v = np.asarray(space[name])[i]
            if add_row:
                v = v.reshape(-1)
            _set(blk, path, v)
        out[f"block_{i}"] = blk
    return out


def convert_vivit_params(params: dict, to: str) -> dict:
    """Convert a full ViViT param tree; ``to`` = "stacked" | "standard".

    No-op (returns the input) when the tree is already in the requested
    layout.
    """
    space = params.get("space_transformer")
    if space is None:
        raise ValueError("not a ViViT param tree (no space_transformer)")
    stacked_now = any(k.startswith("pb_") for k in space)
    if to == "stacked":
        if stacked_now:
            return params
        new_space = stack_block_params(dict(space))
    elif to == "standard":
        if not stacked_now:
            return params
        new_space = unstack_block_params(dict(space))
    else:
        raise ValueError(f"unknown layout {to!r}")
    out = dict(params)
    out["space_transformer"] = new_space
    return out


def convert_payload(obj, to: str):
    """Convert every ViViT-params-shaped subtree in a checkpoint payload
    — the params themselves AND the Adam moments (optax mu/nu mirror the
    param tree), so training continues exactly across layouts."""
    if isinstance(obj, dict):
        if "space_transformer" in obj:
            try:
                return convert_vivit_params(obj, to)
            except (ValueError, KeyError, TypeError):
                pass
        return {k: convert_payload(v, to) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(convert_payload(v, to) for v in obj)
    return obj


def main(argv=None) -> int:
    import argparse
    import os

    import orbax.checkpoint as ocp

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--src", required=True,
                    help="source checkpoint step dir (…/step_N)")
    ap.add_argument("--dst", required=True, help="destination dir")
    ap.add_argument("--to", choices=("standard", "stacked"),
                    default="stacked")
    args = ap.parse_args(argv)

    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.abspath(args.src))   # raw pytree
    payload = convert_payload(payload, args.to)
    step = int(payload.get("step", 0))
    dst = os.path.join(os.path.abspath(args.dst), f"step_{step}")
    ckptr.save(dst, payload, force=True)
    ckptr.wait_until_finished()
    src_cfg = os.path.join(os.path.dirname(os.path.abspath(args.src)),
                           "config.yaml")
    if os.path.exists(src_cfg):
        import shutil

        os.makedirs(os.path.abspath(args.dst), exist_ok=True)
        shutil.copy(src_cfg, os.path.join(os.path.abspath(args.dst),
                                          "config.yaml"))
    print(f"wrote {args.to} layout checkpoint to {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
