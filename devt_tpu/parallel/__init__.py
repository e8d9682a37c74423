"""Device mesh, shardings, and the distributed training step.

The reference has no multi-device execution (``pl.Trainer(gpus=1)``,
src/main.py:87-88) — only latent DP intent (NT_Xent ``world_size``,
commented DALI shards; SURVEY.md §2.8).  Here parallelism is first-class:
a ``(data, model)`` mesh, batch sharded over ``data``, optional tensor
sharding of attention/FFN weights over ``model``, XLA collectives over ICI
inserted by GSPMD from the sharding annotations.
"""

from devt_tpu.parallel.mesh import make_mesh, batch_spec, replicated_spec
from devt_tpu.parallel.sharding import param_partition_specs, shard_variables
from devt_tpu.parallel.train_step import make_train_step, make_eval_step

__all__ = [
    "make_mesh", "batch_spec", "replicated_spec",
    "param_partition_specs", "shard_variables",
    "make_train_step", "make_eval_step",
]
