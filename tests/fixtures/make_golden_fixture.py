"""Generate the golden weight-port fixtures (run ONCE; outputs committed).

Builds torch networks whose module trees / state-dict keys replicate the
torchvision zoo layouts the reference loads
(/root/reference/src/models/pretrained/models.py:10-20,
frame_transformer.py:53,67) at depth (1,1,1,1) — every converter code
path (stem, strided blocks, downsample branches, the (2+1)D mid-planes
decomposition, fc) in a committable size.  Weights are rounded to f16
for storage; the golden outputs are computed AFTER the round-trip, so
the committed bytes are self-consistent and the ≤1e-3 parity criterion
(BASELINE.md) applies unchanged.

Usage:  python tests/fixtures/make_golden_fixture.py
Writes: golden_resnet.npz, golden_r2plus1d.npz next to this file.
"""

import os
import sys

import numpy as np
import torch
import torch.nn as tnn

_TESTS = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _TESTS)                      # the replica classes
sys.path.insert(0, os.path.dirname(_TESTS))     # devt_tpu package root
from test_whole_network_parity import (_randomize_bn, _TBasicBlock,  # noqa: E402
                                       _TConv2Plus1D, _midplanes)

HERE = os.path.dirname(os.path.abspath(__file__))


class _TResNetThin(tnn.Module):
    """torchvision ResNet(BasicBlock, [1,1,1,1]) key layout."""

    def __init__(self, num_classes=16):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for li, planes in enumerate((64, 128, 256, 512)):
            stride = 1 if li == 0 else 2
            setattr(self, f"layer{li + 1}",
                    tnn.Sequential(_TBasicBlock(inplanes, planes, stride)))
            inplanes = planes
        self.fc = tnn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


class _TVideoBasicBlockThin(tnn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        # torchvision computes midplanes ONCE per block (from inplanes,
        # planes) and reuses it for BOTH convs
        mid = _midplanes(inplanes, planes)
        self.conv1 = tnn.Sequential(
            _TConv2Plus1D(inplanes, planes, mid, stride),
            tnn.BatchNorm3d(planes), tnn.ReLU(inplace=True))
        self.conv2 = tnn.Sequential(
            _TConv2Plus1D(planes, planes, mid),
            tnn.BatchNorm3d(planes))
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv3d(inplanes, planes, 1, (stride, stride, stride),
                           bias=False),
                tnn.BatchNorm3d(planes))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.conv1(x)
        out = self.conv2(out)
        return self.relu(out + identity)


class _TR2Plus1DThin(tnn.Module):
    """torchvision VideoResNet(..., [1,1,1,1], R2Plus1dStem) key layout."""

    def __init__(self, num_classes=16):
        super().__init__()
        self.stem = tnn.Sequential(
            tnn.Conv3d(3, 45, (1, 7, 7), (1, 2, 2), (0, 3, 3), bias=False),
            tnn.BatchNorm3d(45), tnn.ReLU(inplace=True),
            tnn.Conv3d(45, 64, (3, 1, 1), (1, 1, 1), (1, 0, 0), bias=False),
            tnn.BatchNorm3d(64), tnn.ReLU(inplace=True))
        inplanes = 64
        for li, planes in enumerate((64, 128, 256, 512)):
            stride = 1 if li == 0 else 2
            setattr(self, f"layer{li + 1}", tnn.Sequential(
                _TVideoBasicBlockThin(inplanes, planes, stride)))
            inplanes = planes
        self.fc = tnn.Linear(512, num_classes)

    def forward(self, x):
        x = self.stem(x)
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        x = x.mean(dim=(2, 3, 4))
        return self.fc(x)


def _dump(model, x, out_path):
    # f16 round-trip the weights, reload, THEN compute the goldens
    sd = {k: torch.from_numpy(
        v.detach().numpy().astype(np.float16).astype(np.float32))
        for k, v in model.state_dict().items()
        if "num_batches_tracked" not in k}
    model.load_state_dict(sd, strict=False)
    model.eval()
    with torch.no_grad():
        y = model(x).numpy()
    arrays = {f"sd::{k}": v.numpy().astype(np.float16)
              for k, v in sd.items()}
    arrays["input"] = x.numpy()
    arrays["output"] = y
    np.savez_compressed(out_path, **arrays)
    n = sum(int(np.prod(v.shape)) for k, v in arrays.items()
            if k.startswith("sd::"))
    print(f"{out_path}: {n / 1e6:.2f}M params, "
          f"{os.path.getsize(out_path) / 1e6:.1f} MB")


def main():
    torch.manual_seed(7)
    rm = _TResNetThin()
    _randomize_bn(rm)
    _dump(rm, torch.randn(2, 3, 64, 64), os.path.join(
        HERE, "golden_resnet.npz"))

    torch.manual_seed(8)
    vm = _TR2Plus1DThin()
    _randomize_bn(vm)
    _dump(vm, torch.randn(1, 3, 8, 32, 32), os.path.join(
        HERE, "golden_r2plus1d.npz"))


if __name__ == "__main__":
    main()
