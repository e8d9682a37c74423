"""ResNet backbones (2D), torchvision-semantics, channels-last.

Covers two reference capabilities:
  * the frozen ``ImgResNet`` frame encoder — torchvision ``resnet18`` with
    its classifier replaced by ``Linear(512, 896)``
    (src/models/frame_transformer.py:50-61, run under ``no_grad``);
  * the multi-stage ``custom_resnet`` used by TPN — identical trunk but
    ``forward`` returns the layer2/3/4 feature maps instead of logits
    (src/models/custom_resnet.py:138-153).

TPU-first: NHWC layout throughout (XLA:TPU's native conv layout — the
reference is NCHW because cuDNN prefers it), BatchNorm running stats in
flax's ``batch_stats`` collection, weight-port converters in
devt_tpu/utils/torch_port.py consume torchvision state_dict naming.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

BN_MOMENTUM = 0.9   # torch BatchNorm momentum 0.1 ⇒ flax momentum 1-0.1
BN_EPS = 1e-5


class ConvBN(nn.Module):
    features: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.padding
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=((p, p), (p, p)), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        return nn.BatchNorm(use_running_average=not train,
                            momentum=BN_MOMENTUM, epsilon=BN_EPS,
                            dtype=self.dtype, name="bn")(x)


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (src/models/custom_resnet.py:25-54 semantics)."""
    planes: int
    strides: tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvBN(self.planes, (3, 3), self.strides, 1,
                     dtype=self.dtype, name="conv1")(x, train)
        out = nn.relu(out)
        out = ConvBN(self.planes, (3, 3), (1, 1), 1,
                     dtype=self.dtype, name="conv2")(out, train)
        if self.downsample:
            identity = ConvBN(self.planes * self.expansion, (1, 1),
                              self.strides, 0, dtype=self.dtype,
                              name="downsample")(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1x1 → 3x3 → 1x1 block (src/models/custom_resnet.py:57-93 semantics)."""
    planes: int
    strides: tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvBN(self.planes, (1, 1), (1, 1), 0,
                     dtype=self.dtype, name="conv1")(x, train)
        out = nn.relu(out)
        out = ConvBN(self.planes, (3, 3), self.strides, 1,
                     dtype=self.dtype, name="conv2")(out, train)
        out = nn.relu(out)
        out = ConvBN(self.planes * self.expansion, (1, 1), (1, 1), 0,
                     dtype=self.dtype, name="conv3")(out, train)
        if self.downsample:
            identity = ConvBN(self.planes * self.expansion, (1, 1),
                              self.strides, 0, dtype=self.dtype,
                              name="downsample")(x, train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """torchvision-semantics ResNet trunk, NHWC.

    ``output``:
      * ``"logits"``   — global-avg-pool → fc (torchvision forward)
      * ``"features"`` — global-avg-pool vector, fc skipped (the reference
        replaces ``fc`` with Identity/projection, frame_transformer.py:53-55)
      * ``"stages"``   — (layer2, layer3, layer4) feature maps
        (src/models/custom_resnet.py:138-153)
    """
    block: type = BasicBlock
    layers: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 1000
    output: str = "logits"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.output in ("logits", "features", "stages")
        x = ConvBN(64, (7, 7), (2, 2), 3, dtype=self.dtype, name="stem")(
            x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        stages = []
        inplanes = 64
        for li, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = (1, 1) if li == 0 else (2, 2)
            for bi in range(blocks):
                s = stride if bi == 0 else (1, 1)
                down = bi == 0 and (s != (1, 1)
                                    or inplanes != planes * self.block.expansion)
                x = self.block(planes, s, down, dtype=self.dtype,
                               name=f"layer{li + 1}_{bi}")(x, train)
            inplanes = planes * self.block.expansion
            stages.append(x)

        if self.output == "stages":
            return tuple(stages[1:])              # layer2, layer3, layer4
        x = jnp.mean(x, axis=(1, 2))              # global average pool
        if self.output == "features":
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


def resnet18(**kw) -> ResNet:
    return ResNet(block=BasicBlock, layers=(2, 2, 2, 2), **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(block=BasicBlock, layers=(3, 4, 6, 3), **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3), **kw)
