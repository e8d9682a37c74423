"""Two-process jax.distributed CPU run (the multi-HOST leg).

Everything else in the suite is single-process multi-device; this spawns
two real processes (2 local CPU devices each → a 4-device global mesh
with Gloo cross-process collectives) and verifies the multi-host
contracts end to end (VERDICT r2 §5):

  * ``parallel/distributed.initialize`` beyond its no-op path;
  * per-host loader sharding — the two processes consume disjoint halves
    of the shared-seed permutation (data/pipeline.py:78-89, the DALI
    ``shard_id`` idea);
  * the shard_map DP train step across processes — the pmean'd loss
    equals the single-process full-batch loss;
  * Orbax save/restore of arrays sharded over the multi-process mesh.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_dist_worker.py")


def test_two_process_cpu_training(tmp_path):
    port = 19764
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(i), str(port), outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=420)
        logs.append(stdout.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)[-4000:]

    results = [json.load(open(o)) for o in outs]
    for i, r in enumerate(results):
        assert r["info"]["process_count"] == 2
        assert r["info"]["global_devices"] == 4
        assert r["info"]["local_devices"] == 2
        assert r["info"]["process_index"] == i
        assert r["strategy"] == "dp_shard_map"
        assert r["ckpt_roundtrip"] and r["restored_step"] == 1

    # loader shards are disjoint, equal-size, and cover the dataset
    a, b = (set(r["loader_indices"]) for r in results)
    assert len(a) == len(b) == 8
    assert not (a & b)
    assert a | b == set(range(16))

    # the cross-process pmean'd loss equals the single-process
    # full-batch loss (computed here, in the parent's 8-device runtime)
    import jax
    import jax.numpy as jnp

    from devt_tpu.config import Config
    from devt_tpu.models.ptn import PTN
    from devt_tpu.parallel.train_step import make_train_step
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
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.asarray(batch["experts"]))
    state = TrainState.create(variables["params"], build_optimizer(cfg))
    _, metrics = make_train_step(model, cfg)(state, batch,
                                             jax.random.PRNGKey(0))
    for r in results:
        np.testing.assert_allclose(r["loss"], float(metrics["loss"]),
                                   rtol=1e-5)
