"""Every scaling axis on one host — no pod required.

Provisions a virtual 8-device CPU mesh (the same trick the test suite
and the driver dryrun use) and runs one real fwd+bwd step of each
parallelism the framework ships (SCALING.md):

  * DP   — shard_map over `data`, grads pmean'd (fused kernels stay hot
           per chip on real TPU meshes)
  * TP   — Megatron kernel sharding over `model` (GSPMD collectives)
  * FSDP — ZeRO-3: the whole TrainState lives sharded over `data`
  * SP   — a pre-norm ViT layer sequence-parallel via a kv ring
  * PP   — GPipe fill/drain over a `pipe` axis
  * EP   — switch-MoE FFN with all_to_all expert dispatch
  * TP (shard_map) — a Megatron-split ViT block where every device runs
           the fused Pallas MHA kernel on its local heads
  * 3-D  — DP x PP x TP in ONE train step: a (data, pipe, model) mesh
           where every GPipe stage executes as the Megatron TP block
  * EP (training) — config.moe_ep: the MoE FFNs shard E/n per device
           over the DP axis, two all_to_alls per layer
  * SP (training) — config.sp: the space transformer's token axis
           shards over a (data, seq) mesh, attention runs the kv ring

On a real TPU slice, delete the CPU-provisioning lines and the same code
runs over ICI; `python -m devt_tpu.main --dp -1 --mp 2` (or
`--dp_mode fsdp`) drives the training entry point the same way.
"""

import os
import sys

# __graft_entry__ lives at the repo root (not in the installed package)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

if __name__ == "__main__":
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
    print("all eleven parallelism legs ran one fwd+bwd step — see SCALING.md")
