"""Serving: bucketed jit inference + checkpoint loading paths."""

import jax
import numpy as np

from devt_tpu.config import Config
from devt_tpu.serve import Predictor


def _tiny_cfg():
    return Config(model="ptn", batch_size=2, seq_len=3, nlayers=1,
                  input_dimension=32, nhid=32, nhead=2, n_classes=15,
                  dropout=0.0, precision="f32", attention_impl="xla",
                  experts=("a", "b"))


def _predictor():
    cfg = _tiny_cfg()
    from devt_tpu.registry import build_model
    model = build_model(cfg)
    x = np.zeros((1, 3, 2, 32), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jax.numpy.asarray(x))
    return Predictor(cfg, variables, buckets=(1, 4))


def test_predict_arbitrary_batch_sizes():
    pred = _predictor()
    for n in (1, 3, 4, 7):
        batch = {"experts": np.random.default_rng(n).standard_normal(
            (n, 3, 2, 32)).astype(np.float32)}
        out = pred.predict(batch)
        assert out["scores"].shape == (n, 15)
        assert len(out["labels"]) == n
        assert np.all(out["scores"] >= 0) and np.all(out["scores"] <= 1)


def test_padding_does_not_change_results():
    pred = _predictor()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 3, 2, 32)).astype(np.float32)
    full = pred.predict({"experts": x})["scores"]
    singles = np.concatenate([
        pred.predict({"experts": x[i:i + 1]})["scores"] for i in range(3)])
    np.testing.assert_allclose(full, singles, atol=1e-5)


def test_from_orbax_checkpoint(tmp_path):
    cfg = _tiny_cfg().replace(checkpoint_dir=str(tmp_path / "ck"))
    from devt_tpu.registry import build_model
    from devt_tpu.train import checkpoint as ckpt_lib
    from devt_tpu.train.optimizers import build_optimizer
    from devt_tpu.train.state import TrainState

    model = build_model(cfg)
    x = np.zeros((1, 3, 2, 32), np.float32)
    variables = dict(model.init({"params": jax.random.PRNGKey(1)},
                                jax.numpy.asarray(x)))
    params = variables.pop("params")
    state = TrainState.create(params, build_optimizer(cfg),
                              model_state=variables)
    path = ckpt_lib.save(cfg.checkpoint_dir, state, cfg)

    pred = Predictor.from_checkpoint(cfg, path, buckets=(2,))
    out = pred.predict({"experts": x})
    assert out["scores"].shape == (1, 15)


def test_predict_uint8_wire_format():
    """Predictor accepts raw u8 pixels (the native decoder's output) and
    normalizes on device — scores match host-normalized f32 input."""
    from devt_tpu.data.transforms import KINETICS_MEAN, KINETICS_STD
    from devt_tpu.registry import build_model

    cfg = Config(model="vid", batch_size=2, seq_len=2, frame_len=2,
                 n_classes=19, dropout=0.0, precision="f32",
                 attention_impl="xla", cls=0)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 2, 2, 32, 32, 3), dtype=np.uint8)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           img=None,
                           vid=jax.numpy.zeros((1, 2, 2, 32, 32, 3)),
                           train=False)
    pred = Predictor(cfg, variables, buckets=(2,))
    s_u8 = pred.predict({"vid": u8})["scores"]

    f32 = (u8.astype(np.float32) / 255.0 - KINETICS_MEAN) / KINETICS_STD
    s_f32 = pred.predict({"vid": f32.astype(np.float32)})["scores"]
    np.testing.assert_allclose(s_u8, s_f32, rtol=2e-4, atol=2e-4)


def test_export_aot_roundtrip(tmp_path):
    """jax.export artifact: params baked in, runs without the model code
    and reproduces the live predictor's scores."""
    from devt_tpu.serve import load_exported

    pred = _predictor()
    path = str(tmp_path / "ptn.stablehlo")
    pred.export(path, batch_size=4)
    assert (tmp_path / "ptn.stablehlo").stat().st_size > 0

    call = load_exported(path)
    rng = np.random.default_rng(7)
    batch = {"experts": rng.standard_normal((4, 3, 2, 32)).astype(np.float32)}
    live = pred.predict(batch)["scores"]
    aot = np.asarray(call(batch))
    np.testing.assert_allclose(aot, live, atol=1e-6, rtol=1e-6)


def test_mesh_sharded_serving_matches_single_device():
    """DP-mesh Predictor: requests shard over the data axis (weights
    replicated) and scores equal the single-device predictor's."""
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 8:
        import pytest
        pytest.skip("needs the virtual 8-device mesh")
    from devt_tpu.parallel.mesh import make_mesh

    cfg = _tiny_cfg()
    from devt_tpu.registry import build_model
    model = build_model(cfg)
    x0 = np.zeros((1, 3, 2, 32), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jax.numpy.asarray(x0))
    mesh = make_mesh(dp=8, mp=1, devices=devs[:8])
    plain = Predictor(cfg, variables, buckets=(1, 4))
    sharded = Predictor(cfg, variables, buckets=(1, 4), mesh=mesh)
    assert sharded.buckets == [8]  # rounded up to divide the data axis

    rng = np.random.default_rng(3)
    batch = {"experts": rng.standard_normal((11, 3, 2, 32)).astype(np.float32)}
    s_plain = plain.predict(batch)["scores"]
    s_mesh = sharded.predict(batch)["scores"]
    np.testing.assert_allclose(s_mesh, s_plain, atol=2e-5, rtol=2e-4)


def test_export_cross_platform(tmp_path):
    """platforms=("cpu","tpu"): a CPU box produces one artifact servable
    on either backend (lowering embeds both platforms)."""
    from jax import export as jexport

    pred = _predictor()
    path = str(tmp_path / "xplat.stablehlo")
    pred.export(path, batch_size=1, platforms=("cpu", "tpu"))
    with open(path, "rb") as f:
        exp = jexport.deserialize(bytearray(f.read()))
    assert exp.platforms == ("cpu", "tpu")
    out = np.asarray(exp.call(
        {"experts": np.zeros((1, 3, 2, 32), np.float32)}))
    assert out.shape == (1, 15) and np.isfinite(out).all()
