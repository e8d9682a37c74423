"""Worker process for tests/test_distributed.py — run as
``python _dist_worker.py <process_id> <port> <out_json>``.

Initialises a 2-process jax.distributed CPU runtime (2 local devices per
process → 4 global) and exercises the multi-host contracts:

  * per-host loader sharding (data/pipeline.py:78-89) — records which
    dataset indices this process consumed;
  * the shard_map DP train step over a multi-process 4-device mesh —
    records the (globally pmean'd) loss for the parent to compare with
    the single-process value;
  * Orbax save/restore of the TrainState plus an array SHARDED over the
    multi-process mesh — each process writes/reads only its shards.
"""

import json
import os
import sys


def main() -> None:
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from devt_tpu.parallel.distributed import initialize, runtime_info

    assert initialize(coordinator_address=f"localhost:{port}",
                      num_processes=2, process_id=pid)
    info = runtime_info()
    result = {"info": info}

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    # --- per-host loader sharding: disjoint index shards ---------------
    from devt_tpu.data.pipeline import Loader

    class IdxDataset:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"x": np.asarray([i], np.float32)}

    loader = Loader(IdxDataset(), batch_size=2, shuffle=True, seed=5,
                    num_workers=1)
    seen = sorted(int(b["x"][j, 0]) for b in loader for j in range(2))
    result["loader_indices"] = seen

    # --- shard_map DP train step over the multi-process mesh -----------
    from devt_tpu.config import Config
    from devt_tpu.models.ptn import PTN
    from devt_tpu.parallel.mesh import make_mesh
    from devt_tpu.parallel.train_step import make_train_step, mesh_strategy
    from devt_tpu.train.optimizers import build_optimizer
    from devt_tpu.train.state import TrainState

    cfg = Config(model="ptn", batch_size=8, seq_len=4, nlayers=1,
                 input_dimension=32, nhid=32, nhead=2, dropout=0.0,
                 n_classes=15, experts=("a", "b"), learning_rate=1e-3,
                 opt="adamW", precision="f32", attention_impl="xla")
    model = PTN(input_dimension=32, nhead=2, nhid=32, nlayers=1,
                num_experts=2, seq_len=4, n_classes=15, dropout=0.0,
                attention_impl="xla")
    rng = np.random.default_rng(0)
    batch = {"experts": rng.standard_normal((8, 4, 2, 32),
                                            dtype=np.float32),
             "label": (rng.random((8, 15)) < 0.3).astype(np.float32)}
    init_rngs = {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}
    variables = model.init(init_rngs, jnp.asarray(batch["experts"]))
    state = TrainState.create(variables["params"], build_optimizer(cfg))

    mesh = make_mesh(dp=4, mp=1)
    result["strategy"] = mesh_strategy(mesh, cfg)
    # params replicated across the multi-process mesh; the batch sharded
    # over data (every process holds the same host copy → same global)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    placed = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
              for k, v in batch.items()}
    step = make_train_step(model, cfg, mesh=mesh)
    state, metrics = step(state, placed, jax.random.PRNGKey(0))
    result["loss"] = float(metrics["loss"])

    # --- Orbax save/restore with mesh-sharded arrays -------------------
    import orbax.checkpoint as ocp

    sharded = jax.device_put(
        np.arange(16, dtype=np.float32).reshape(4, 4),
        NamedSharding(mesh, P("data")))
    payload = {"params": state.params, "step": state.step,
               "sharded": sharded}
    ckpt_dir = os.path.join(os.path.dirname(out_path), "ckpt")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, payload, force=True)
        ckptr.wait_until_finished()
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, payload)
        restored = ckptr.restore(ckpt_dir, abstract)
    ok = all(
        np.allclose(np.asarray(a.addressable_data(i)),
                    np.asarray(b.addressable_data(i)))
        for a, b in [(payload["sharded"], restored["sharded"])]
        for i in range(len(a.addressable_shards)))
    ok = ok and all(
        np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(
            jax.tree_util.tree_leaves(payload["params"]),
            jax.tree_util.tree_leaves(restored["params"])))
    result["ckpt_roundtrip"] = bool(ok)
    result["restored_step"] = int(restored["step"])

    with open(out_path, "w") as fp:
        json.dump(result, fp)


if __name__ == "__main__":
    main()
