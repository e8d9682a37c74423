"""Lightning-checkpoint import: reference state_dict → devt_tpu variables.

The state_dicts are synthesized with torchvision's exact key names and
shapes (torchvision itself is absent in this image); the layout-primitive
converters underneath are validated against real torch modules in
test_layers.py / test_backbones.py.
"""

import numpy as np
import pytest

from devt_tpu.models.frame_transformer import FrameTransformer
from devt_tpu.models.ptn import PTN
from devt_tpu.models.r2plus1d import _midplanes
from devt_tpu.utils import lightning_import

pytestmark = pytest.mark.slow

RNG = np.random.default_rng(0)


def _t(*shape):
    return RNG.standard_normal(shape).astype(np.float32) * 0.02


def _bn(sd, prefix, c):
    sd[f"{prefix}.weight"] = np.ones(c, np.float32)
    sd[f"{prefix}.bias"] = np.zeros(c, np.float32)
    sd[f"{prefix}.running_mean"] = _t(c)[()]
    sd[f"{prefix}.running_var"] = np.abs(_t(c)) + 1.0
    sd[f"{prefix}.num_batches_tracked"] = np.int64(1)


def _r2plus1d_sd(prefix=""):
    """torchvision r2plus1d_18 state_dict keys/shapes + fc.0 Linear(512,896)."""
    p = prefix + "." if prefix else ""
    sd = {}
    sd[f"{p}stem.0.weight"] = _t(45, 3, 1, 7, 7)
    _bn(sd, f"{p}stem.1", 45)
    sd[f"{p}stem.3.weight"] = _t(64, 45, 3, 1, 1)
    _bn(sd, f"{p}stem.4", 64)
    inplanes = 64
    for li, planes in enumerate((64, 128, 256, 512)):
        for bi in range(2):
            t = f"{p}layer{li + 1}.{bi}"
            inp = inplanes if bi == 0 else planes
            mid = _midplanes(inp, planes)
            for ci, cin in ((1, inp), (2, planes)):
                m = _midplanes(inp, planes)
                sd[f"{t}.conv{ci}.0.0.weight"] = _t(m, cin, 1, 3, 3)
                _bn(sd, f"{t}.conv{ci}.0.1", m)
                sd[f"{t}.conv{ci}.0.3.weight"] = _t(planes, m, 3, 1, 1)
                _bn(sd, f"{t}.conv{ci}.1", planes)
            if bi == 0 and (li > 0 or inplanes != planes):
                sd[f"{t}.downsample.0.weight"] = _t(planes, inp, 1, 1, 1)
                _bn(sd, f"{t}.downsample.1", planes)
        inplanes = planes
    sd[f"{p}fc.0.weight"] = _t(896, 512)
    sd[f"{p}fc.0.bias"] = _t(896)
    return sd


def _resnet18_sd(prefix=""):
    p = prefix + "." if prefix else ""
    sd = {}
    sd[f"{p}conv1.weight"] = _t(64, 3, 7, 7)
    _bn(sd, f"{p}bn1", 64)
    inplanes = 64
    for li, planes in enumerate((64, 128, 256, 512)):
        for bi in range(2):
            t = f"{p}layer{li + 1}.{bi}"
            inp = inplanes if bi == 0 else planes
            sd[f"{t}.conv1.weight"] = _t(planes, inp, 3, 3)
            _bn(sd, f"{t}.bn1", planes)
            sd[f"{t}.conv2.weight"] = _t(planes, planes, 3, 3)
            _bn(sd, f"{t}.bn2", planes)
            if bi == 0 and li > 0:
                sd[f"{t}.downsample.0.weight"] = _t(planes, inp, 1, 1)
                _bn(sd, f"{t}.downsample.1", planes)
        inplanes = planes
    sd[f"{p}fc.0.weight"] = _t(896, 512)
    sd[f"{p}fc.0.bias"] = _t(896)
    return sd


def _encoder_sd(prefix, d_model, ff, nlayers):
    sd = {}
    for i in range(nlayers):
        t = f"{prefix}.layers.{i}"
        sd[f"{t}.self_attn.in_proj_weight"] = _t(3 * d_model, d_model)
        sd[f"{t}.self_attn.in_proj_bias"] = _t(3 * d_model)
        sd[f"{t}.self_attn.out_proj.weight"] = _t(d_model, d_model)
        sd[f"{t}.self_attn.out_proj.bias"] = _t(d_model)
        sd[f"{t}.linear1.weight"] = _t(ff, d_model)
        sd[f"{t}.linear1.bias"] = _t(ff)
        sd[f"{t}.linear2.weight"] = _t(d_model, ff)
        sd[f"{t}.linear2.bias"] = _t(d_model)
        for norm in ("norm1", "norm2"):
            sd[f"{t}.{norm}.weight"] = np.ones(d_model, np.float32)
            sd[f"{t}.{norm}.bias"] = np.zeros(d_model, np.float32)
    return sd


def _frame_transformer_sd():
    sd = {}
    sd.update({f"vid_model.backbone.{k}": v
               for k, v in _r2plus1d_sd().items()})
    sd.update({f"img_model.backbone.{k}": v
               for k, v in _resnet18_sd().items()})
    sd.update(_encoder_sd("distil_transformer.transformer", 896, 512, 4))
    sd.update(_encoder_sd("scene_transformer.transformer", 896, 896, 4))
    sd["vid_cls"] = _t(1, 12, 3, 112, 112)
    sd["img_cls"] = _t(1, 3, 224, 224)
    sd["img_mlp_head.0.weight"] = _t(512, 896)
    sd["img_mlp_head.0.bias"] = _t(512)
    sd["img_mlp_head.2.weight"] = _t(128, 512)
    sd["img_mlp_head.2.bias"] = _t(128)
    sd["img_mlp_head.4.weight"] = _t(19, 128)
    sd["img_mlp_head.4.bias"] = _t(19)
    return sd


def test_frame_transformer_import_structure_and_forward():
    import jax
    import jax.numpy as jnp

    sd = _frame_transformer_sd()
    variables = lightning_import.frame_transformer(sd)

    model = FrameTransformer(model="distil", seq_len=2, frame_len=12,
                             n_classes=19, attention_impl="xla")
    img = jnp.zeros((1, 2, 224, 224, 3))
    vid = jnp.zeros((1, 2, 12, 112, 112, 3))
    init = model.init({"params": jax.random.PRNGKey(0)},
                      img=img, vid=vid, train=False)

    # imported tree must structurally match the model's init tree
    flat_init = {"/".join(map(str, k)): v.shape for k, v in
                 jax.tree_util.tree_flatten_with_path(init["params"])[0]}
    flat_imp = {"/".join(map(str, k)): np.asarray(v).shape for k, v in
                jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
    assert flat_init.keys() == flat_imp.keys()
    for k in flat_init:
        assert flat_init[k] == flat_imp[k], k

    # spot checks: tensors landed transposed/re-laid-out correctly
    np.testing.assert_array_equal(
        variables["params"]["img_mlp_head"]["fc0"]["kernel"],
        sd["img_mlp_head.0.weight"].T)
    np.testing.assert_array_equal(
        variables["params"]["vid_cls"],
        sd["vid_cls"][0].transpose(0, 2, 3, 1))
    np.testing.assert_array_equal(
        variables["params"]["distil_transformer"]["layer_0"]["self_attn"]
        ["in_proj"]["kernel"],
        sd["distil_transformer.transformer.layers.0.self_attn"
           ".in_proj_weight"].T)

    # forward runs with the imported weights and differs from random init
    batch_stats = {"batch_stats": variables["batch_stats"]}
    out = model.apply({"params": variables["params"], **batch_stats},
                      img=img, vid=vid, train=False)
    ref = model.apply(init, img=img, vid=vid, train=False)
    assert out["logits"].shape == (1, 19)
    assert np.isfinite(np.asarray(out["logits"])).all()
    assert not np.allclose(out["logits"], ref["logits"])


def test_simple_transformer_import():
    import jax
    import jax.numpy as jnp

    d, ff, nlayers = 64, 128, 2
    sd = {}
    sd.update(_encoder_sd("transformer_encoder0", d, ff, nlayers))
    sd.update(_encoder_sd("transformer_encoder1", d, ff, nlayers))
    sd["cls"] = _t(1, 2, d)
    sd["norm.weight"] = np.ones(d, np.float32)
    sd["norm.bias"] = np.zeros(d, np.float32)
    sd["mlp_head.0.weight"] = np.ones(d, np.float32)
    sd["mlp_head.0.bias"] = np.zeros(d, np.float32)
    sd["mlp_head.1.weight"] = _t(15, d)
    sd["mlp_head.1.bias"] = _t(15)

    variables = lightning_import.simple_transformer(sd, nlayers=nlayers,
                                                    num_experts=2)
    model = PTN(input_dimension=d, nhead=2, nhid=ff, nlayers=nlayers,
                num_experts=2, seq_len=3, n_classes=15, dropout=0.0,
                attention_impl="xla")
    x = jnp.zeros((2, 3, 2, d))
    init = model.init({"params": jax.random.PRNGKey(0)}, x)
    flat_init = {"/".join(map(str, k)) for k, _ in
                 jax.tree_util.tree_flatten_with_path(init["params"])[0]}
    flat_imp = {"/".join(map(str, k)) for k, _ in
                jax.tree_util.tree_flatten_with_path(
                    variables["params"])[0]}
    assert flat_init == flat_imp
    out = model.apply(variables, x)
    assert out.shape == (2, 15)
