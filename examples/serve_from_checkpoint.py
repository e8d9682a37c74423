"""Train briefly, checkpoint (async Orbax), then serve predictions with
the bucketed-jit Predictor — the reference main.py's test-from-checkpoint
behavior (src/main.py:89,111) as a serving flow.
"""

import numpy as np

from devt_tpu.config import Config
from devt_tpu.main import build_datamodule
from devt_tpu.registry import build_model
from devt_tpu.serve import Predictor
from devt_tpu.train import checkpoint as ckpt_lib
from devt_tpu.train.harness import Trainer

if __name__ == "__main__":
    cfg = Config(model="ptn", data_set="synthetic", batch_size=4,
                 seq_len=4, nlayers=1, input_dimension=64, nhid=64,
                 nhead=2, n_classes=15, epochs=1, max_steps=8,
                 experts=("img-embeddings", "video-embeddings"),
                 precision="f32", attention_impl="xla", dropout=0.0,
                 checkpoint_dir="/tmp/devt_example_serve")
    model = build_model(cfg)
    state = Trainer(cfg).fit(model, build_datamodule(cfg))

    path = ckpt_lib.latest_checkpoint(cfg.checkpoint_dir)
    pred = Predictor.from_checkpoint(cfg, path, buckets=(1, 4))
    x = np.random.default_rng(0).standard_normal(
        (3, 4, 2, 64)).astype(np.float32)
    out = pred.predict({"experts": x})
    print("scores", out["scores"].shape, "labels:", out["labels"][0])

    # AOT deployment artifact: one self-contained StableHLO blob (params
    # baked in) that runs without model code, flax, or the checkpoint —
    # platforms=("cpu", "tpu") makes it servable on either backend
    from devt_tpu.serve import load_exported

    pred.export("/tmp/devt_example_serve/model.stablehlo", batch_size=4)
    call = load_exported("/tmp/devt_example_serve/model.stablehlo")
    aot = np.asarray(call({"experts": np.concatenate([x, x[:1]])}))
    assert np.allclose(aot[:3], out["scores"], atol=1e-5)
    print("AOT artifact reproduces the live scores")
