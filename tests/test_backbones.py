"""Backbone primitive parity vs torch (conv/BN/pool semantics).

These pin down the NHWC↔NCHW layout conversions, padding conventions and
BatchNorm eval semantics that full-network weight porting relies on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from devt_tpu.models.resnet import BasicBlock, ConvBN, resnet18
from devt_tpu.models.r2plus1d import Conv2Plus1D, _midplanes
from devt_tpu.utils import torch_port

RNGS = {"params": jax.random.PRNGKey(0)}


def _to_nhwc(x):
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 1))


def _from_nhwc(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


def test_convbn_7x7_stride2_parity():
    torch.manual_seed(0)
    conv = tnn.Conv2d(3, 16, 7, stride=2, padding=3, bias=False)
    bn = tnn.BatchNorm2d(16)
    bn.running_mean.normal_(); bn.running_var.uniform_(0.5, 2.0)
    conv.eval(); bn.eval()

    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = bn(conv(x)).numpy()

    mod = ConvBN(16, (7, 7), (2, 2), 3)
    bn_params, bn_stats = torch_port.batchnorm(
        {f"bn.{k}": v for k, v in bn.state_dict().items()}, "bn")
    variables = {
        "params": {"conv": torch_port.conv2d(
            {"conv.weight": conv.weight}, "conv"), "bn": bn_params},
        "batch_stats": {"bn": bn_stats},
    }
    out = mod.apply(variables, _to_nhwc(x), train=False)
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=1e-4, rtol=1e-3)


def test_basic_block_with_downsample_parity():
    torch.manual_seed(1)

    class TorchBasicBlock(tnn.Module):
        def __init__(self, inp, planes, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, planes, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.down_conv = tnn.Conv2d(inp, planes, 1, stride, bias=False)
            self.down_bn = tnn.BatchNorm2d(planes)

        def forward(self, x):
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + self.down_bn(self.down_conv(x)))

    tb = TorchBasicBlock(8, 16, 2).eval()
    for m in tb.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(std=0.1)
            m.running_var.uniform_(0.5, 2.0)

    x = torch.randn(2, 8, 16, 16)
    with torch.no_grad():
        ref = tb(x).numpy()

    sd = tb.state_dict()
    def convbn(conv_key, bn_key):
        bnp, bns = torch_port.batchnorm(sd, bn_key)
        return ({"conv": torch_port.conv2d(sd, conv_key), "bn": bnp},
                {"bn": bns})

    p1, s1 = convbn("conv1", "bn1")
    p2, s2 = convbn("conv2", "bn2")
    pd, sd_ = convbn("down_conv", "down_bn")
    variables = {"params": {"conv1": p1, "conv2": p2, "downsample": pd},
                 "batch_stats": {"conv1": s1, "conv2": s2, "downsample": sd_}}
    mod = BasicBlock(16, (2, 2), downsample=True)
    out = mod.apply(variables, _to_nhwc(x), train=False)
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=1e-4, rtol=1e-3)


def test_maxpool_3x3_s2_p1_parity():
    torch.manual_seed(2)
    x = torch.randn(1, 4, 17, 17)
    ref = tnn.functional.max_pool2d(x, 3, 2, 1).numpy()
    import flax.linen as fnn
    out = fnn.max_pool(_to_nhwc(x), (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=1e-6)


def test_conv2plus1d_parity():
    torch.manual_seed(3)
    inp, outp, stride = 4, 8, 2
    mid = _midplanes(inp, outp)

    spatial = tnn.Conv3d(inp, mid, (1, 3, 3), (1, stride, stride),
                         (0, 1, 1), bias=False)
    bn = tnn.BatchNorm3d(mid)
    temporal = tnn.Conv3d(mid, outp, (3, 1, 1), (stride, 1, 1),
                          (1, 0, 0), bias=False)
    bn.running_mean.normal_(std=0.1); bn.running_var.uniform_(0.5, 2.0)
    for m in (spatial, bn, temporal):
        m.eval()

    x = torch.randn(2, inp, 6, 12, 12)       # (B, C, T, H, W)
    with torch.no_grad():
        ref = temporal(torch.relu(bn(spatial(x)))).numpy()

    sd = {"spatial.weight": spatial.weight, "temporal.weight": temporal.weight}
    sd.update({f"bn.{k}": v for k, v in bn.state_dict().items()})
    bnp, bns = torch_port.batchnorm(sd, "bn")
    variables = {
        "params": {
            "spatial": {"conv": torch_port.conv3d(sd, "spatial"), "bn": bnp},
            "temporal": torch_port.conv3d(sd, "temporal"),
        },
        "batch_stats": {"spatial": {"bn": bns}},
    }
    mod = Conv2Plus1D(outp, mid, stride)
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))  # NCDHW→NDHWC
    out = mod.apply(variables, x_nhwc, train=False)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 4, 1, 2, 3), ref,
                               atol=1e-4, rtol=1e-3)


def test_resnet18_batch_stats_update_in_train_mode():
    model = resnet18(output="features")
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(RNGS, x, train=False)
    out, mutated = model.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    assert out.shape == (2, 512)
    before = variables["batch_stats"]["stem"]["bn"]["mean"]
    after = mutated["batch_stats"]["stem"]["bn"]["mean"]
    assert not np.allclose(before, after)
