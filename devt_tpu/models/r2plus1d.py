"""R(2+1)D-18 video backbone, torchvision-semantics, channels-last.

The reference's clip encoder is torchvision ``models.video.r2plus1d_18``
with its classifier replaced by ``Linear(512, 896)``
(src/models/frame_transformer.py:64-74).  Every 3x3x3 convolution is
factorised into a (1,3,3) spatial conv into ``midplanes`` channels and a
(3,1,1) temporal conv, with BN+ReLU between — the "(2+1)D" decomposition.

``midplanes = (in * out * 3*3*3) // (in * 3*3 + 3 * out)`` keeps the
parameter count of the factorised pair equal to the full 3D conv
(torchvision's formula, reproduced so ported torchvision weights fit).

TPU-first: NDHWC layout (B, T, H, W, C) — XLA:TPU's native 3D-conv layout.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from devt_tpu.models.resnet import BN_EPS, BN_MOMENTUM


def _midplanes(inp: int, outp: int) -> int:
    return (inp * outp * 3 * 3 * 3) // (inp * 3 * 3 + 3 * outp)


class ConvBN3d(nn.Module):
    features: int
    kernel: tuple[int, int, int]
    strides: tuple[int, int, int] = (1, 1, 1)
    padding: tuple[int, int, int] = (0, 0, 0)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = tuple((p, p) for p in self.padding)
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=pad, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        return nn.BatchNorm(use_running_average=not train,
                            momentum=BN_MOMENTUM, epsilon=BN_EPS,
                            dtype=self.dtype, name="bn")(x)


class Conv2Plus1D(nn.Module):
    """(1,3,3) spatial conv → BN → ReLU → (3,1,1) temporal conv."""
    features: int
    midplanes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.stride
        x = ConvBN3d(self.midplanes, (1, 3, 3), (1, s, s), (0, 1, 1),
                     dtype=self.dtype, name="spatial")(x, train)
        x = nn.relu(x)
        return nn.Conv(self.features, (3, 1, 1), strides=(s, 1, 1),
                       padding=((1, 1), (0, 0), (0, 0)), use_bias=False,
                       dtype=self.dtype, name="temporal")(x)


class VideoBasicBlock(nn.Module):
    """Residual block of two (2+1)D convs.  ``midplanes`` is computed from
    the block's (in, planes) pair and used for *both* convs — torchvision's
    quirk, kept for weight compatibility."""
    inplanes: int
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = _midplanes(self.inplanes, self.planes)
        identity = x

        out = Conv2Plus1D(self.planes, mid, self.stride, dtype=self.dtype,
                          name="conv1")(x, train)
        out = nn.BatchNorm(use_running_average=not train,
                           momentum=BN_MOMENTUM, epsilon=BN_EPS,
                           dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = Conv2Plus1D(self.planes, mid, 1, dtype=self.dtype,
                          name="conv2")(out, train)
        out = nn.BatchNorm(use_running_average=not train,
                           momentum=BN_MOMENTUM, epsilon=BN_EPS,
                           dtype=self.dtype, name="bn2")(out)

        if self.stride != 1 or self.inplanes != self.planes:
            s = self.stride
            identity = ConvBN3d(self.planes, (1, 1, 1), (s, s, s), (0, 0, 0),
                                dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + identity)


class R2Plus1D(nn.Module):
    """R(2+1)D video ResNet.  Input (B, T, H, W, C) → logits / features.

    ``output="stages"`` returns the layer4 activation map (B, T/8, H/16,
    W/16, 512) before pooling — the reference's Grad-CAM target
    ``vid_model.backbone.layer4[-1]`` (src/main.py:95-108)."""
    layers: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 400
    output: str = "logits"     # "logits" | "features" | "stages"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.output in ("logits", "features", "stages")
        # R(2+1)D stem: (1,7,7) spatial into 45 mid channels, then (3,1,1)
        # temporal into 64.
        x = ConvBN3d(45, (1, 7, 7), (1, 2, 2), (0, 3, 3),
                     dtype=self.dtype, name="stem_spatial")(x, train)
        x = nn.relu(x)
        x = ConvBN3d(64, (3, 1, 1), (1, 1, 1), (1, 0, 0),
                     dtype=self.dtype, name="stem_temporal")(x, train)
        x = nn.relu(x)

        inplanes = 64
        for li, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                x = VideoBasicBlock(inplanes, planes, s, dtype=self.dtype,
                                    name=f"layer{li + 1}_{bi}")(x, train)
                inplanes = planes
            # (inplanes updates inside the loop: first block changes width)

        if self.output == "stages":
            return x                               # layer4 map, pre-pool
        x = jnp.mean(x, axis=(1, 2, 3))            # global avg pool (T,H,W)
        if self.output == "features":
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


def r2plus1d_18(**kw) -> R2Plus1D:
    return R2Plus1D(layers=(2, 2, 2, 2), **kw)


class R3DBasicBlock(nn.Module):
    """Plain 3x3x3 residual block (torchvision ``r3d_18`` semantics — the
    reference's video *expert* extractor uses ``models.video.r3d_18``,
    src/models/pretrained/models.py:14-15)."""
    inplanes: int
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.stride
        identity = x
        out = ConvBN3d(self.planes, (3, 3, 3), (s, s, s), (1, 1, 1),
                       dtype=self.dtype, name="conv1")(x, train)
        out = nn.relu(out)
        out = ConvBN3d(self.planes, (3, 3, 3), (1, 1, 1), (1, 1, 1),
                       dtype=self.dtype, name="conv2")(out, train)
        if s != 1 or self.inplanes != self.planes:
            identity = ConvBN3d(self.planes, (1, 1, 1), (s, s, s), (0, 0, 0),
                                dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + identity)


class R3D(nn.Module):
    """3D ResNet (torchvision ``r3d_18``).  Input (B, T, H, W, C)."""
    layers: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 400
    output: str = "logits"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.output in ("logits", "features")
        # r3d stem: (3,7,7) conv stride (1,2,2)
        x = ConvBN3d(64, (3, 7, 7), (1, 2, 2), (1, 3, 3),
                     dtype=self.dtype, name="stem")(x, train)
        x = nn.relu(x)
        inplanes = 64
        for li, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                x = R3DBasicBlock(inplanes, planes, s, dtype=self.dtype,
                                  name=f"layer{li + 1}_{bi}")(x, train)
                inplanes = planes
        x = jnp.mean(x, axis=(1, 2, 3))
        if self.output == "features":
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


def r3d_18(**kw) -> R3D:
    return R3D(layers=(2, 2, 2, 2), **kw)
