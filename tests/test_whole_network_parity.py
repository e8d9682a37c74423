"""Whole-network forward parity vs torch (BASELINE.md: logits ≤1e-3).

The reference builds its models on torchvision backbones
(src/models/frame_transformer.py:53,67).  torchvision is not in this
image, so each test constructs a plain-torch replica that reproduces the
torchvision module tree *and state-dict key names* exactly, ports the
(randomly initialised, randomized-BN-stats) weights through
utils/torch_port, and asserts full-network forward parity — catching
stage-wiring bugs that the block-level tests (test_backbones.py) cannot.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from devt_tpu.models.frame_transformer import FrameTransformer
from devt_tpu.models.r2plus1d import r2plus1d_18
from devt_tpu.models.resnet import resnet18
from devt_tpu.utils import lightning_import, torch_port

pytestmark = pytest.mark.slow


def _randomize_bn(model):
    """Non-trivial running stats so porting bugs can't hide behind 0/1."""
    for m in model.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
            m.running_mean.normal_(std=0.2)
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.normal_(std=0.2)


# ---------------------------------------------------------------------------
# torchvision-resnet18 replica (module tree == torchvision's state_dict keys:
# conv1/bn1/layer{1-4}.{0,1}.conv{1,2}/bn{1,2}/downsample.{0,1}/fc)
# ---------------------------------------------------------------------------


class _TBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + identity)


class _TResNet18(tnn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths = (64, 128, 256, 512)
        inplanes = 64
        for li, planes in enumerate(widths):
            stride = 1 if li == 0 else 2
            layer = tnn.Sequential(_TBasicBlock(inplanes, planes, stride),
                                   _TBasicBlock(planes, planes))
            setattr(self, f"layer{li + 1}", layer)
            inplanes = planes
        self.fc = tnn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def test_resnet18_whole_network_parity():
    torch.manual_seed(0)
    tm = _TResNet18().eval()
    _randomize_bn(tm)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = tm(x).numpy()

    variables = torch_port.resnet(tm.state_dict())
    model = resnet18(num_classes=1000, output="logits")
    out = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False)
    out = np.asarray(out)
    rel = np.abs(out - ref) / (np.abs(ref).max() + 1e-8)
    assert rel.max() < 1e-3, f"max rel err {rel.max():.2e}"


# ---------------------------------------------------------------------------
# torchvision-r2plus1d_18 replica (VideoResNet module tree: stem.{0,1,3,4},
# layer{l}.{b}.conv{1,2}.0.{0,1,3} / conv{1,2}.1 / downsample.{0,1} / fc)
# ---------------------------------------------------------------------------


def _midplanes(inplanes, planes):
    return (inplanes * planes * 3 * 3 * 3) // (
        inplanes * 3 * 3 + 3 * planes)


class _TConv2Plus1D(tnn.Sequential):
    def __init__(self, inplanes, planes, midplanes, stride=1):
        super().__init__(
            tnn.Conv3d(inplanes, midplanes, (1, 3, 3),
                       stride=(1, stride, stride), padding=(0, 1, 1),
                       bias=False),
            tnn.BatchNorm3d(midplanes),
            tnn.ReLU(inplace=True),
            tnn.Conv3d(midplanes, planes, (3, 1, 1),
                       stride=(stride, 1, 1), padding=(1, 0, 0),
                       bias=False))


class _TVideoBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        # torchvision computes midplanes once per block (from inplanes,
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
                tnn.Conv3d(inplanes, planes, 1, stride=(stride,) * 3,
                           bias=False),
                tnn.BatchNorm3d(planes))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.conv2(self.conv1(x))
        return self.relu(out + identity)


class _TR2Plus1D18(tnn.Module):
    def __init__(self, num_classes=400):
        super().__init__()
        self.stem = tnn.Sequential(
            tnn.Conv3d(3, 45, (1, 7, 7), stride=(1, 2, 2),
                       padding=(0, 3, 3), bias=False),
            tnn.BatchNorm3d(45), tnn.ReLU(inplace=True),
            tnn.Conv3d(45, 64, (3, 1, 1), stride=1, padding=(1, 0, 0),
                       bias=False),
            tnn.BatchNorm3d(64), tnn.ReLU(inplace=True))
        inplanes = 64
        for li, planes in enumerate((64, 128, 256, 512)):
            stride = 1 if li == 0 else 2
            layer = tnn.Sequential(
                _TVideoBasicBlock(inplanes, planes, stride),
                _TVideoBasicBlock(planes, planes))
            setattr(self, f"layer{li + 1}", layer)
            inplanes = planes
        self.fc = tnn.Linear(512, num_classes)

    def forward(self, x):
        x = self.stem(x)
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        x = x.mean(dim=(2, 3, 4))
        return self.fc(x)


def test_r2plus1d_whole_network_parity():
    torch.manual_seed(1)
    tm = _TR2Plus1D18().eval()
    _randomize_bn(tm)
    x = torch.randn(1, 3, 8, 32, 32)          # (B, C, T, H, W)
    with torch.no_grad():
        ref = tm(x).numpy()

    variables = torch_port.r2plus1d(tm.state_dict())
    model = r2plus1d_18(num_classes=400, output="logits")
    out = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1)),   # NCDHW→NDHWC
        train=False)
    out = np.asarray(out)
    rel = np.abs(out - ref) / (np.abs(ref).max() + 1e-8)
    assert rel.max() < 1e-3, f"max rel err {rel.max():.2e}"


# ---------------------------------------------------------------------------
# FrameTransformer 'vid' variant: full torch assembly (VidResNet + vid_cls +
# sinusoidal PE + distil_transformer + CLS head) vs the flax model with the
# SAME weights imported through utils/lightning_import.
# ---------------------------------------------------------------------------


class _TPositionalEncoding(tnn.Module):
    """Reference PE (src/models/frame_transformer.py:19-34): base 1000.0,
    seq-major (S, B, D), dropout 0 at eval."""

    def __init__(self, d_model, max_len=14):
        super().__init__()
        pe = torch.zeros(max_len, d_model)
        position = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
        div = torch.exp(torch.arange(0, d_model, 2).float()
                        * (-math.log(1000.0) / d_model))
        pe[:, 0::2] = torch.sin(position * div)
        pe[:, 1::2] = torch.cos(position * div)
        self.register_buffer("pe", pe.unsqueeze(0).transpose(0, 1))

    def forward(self, x):
        return x + self.pe[: x.size(0), :]


class _TFrameTransformerVid(tnn.Module):
    """The reference's vid path (src/models/frame_transformer.py:177-210):
    per-scene R(2+1)D features, learned clip CLS prepended, PE, 4-layer
    2-head encoder, CLS → img_mlp_head."""

    def __init__(self, seq_len=2, n_classes=19):
        super().__init__()
        backbone = _TR2Plus1D18()
        backbone.fc = tnn.Sequential(tnn.Linear(512, 896))
        self.vid_model = tnn.Module()
        self.vid_model.backbone = backbone
        self.vid_cls = tnn.Parameter(torch.rand(1, 12, 3, 112, 112))
        self.position_encoder = _TPositionalEncoding(896, max_len=14)
        layer = tnn.TransformerEncoderLayer(896, 2, 512, dropout=0.0)
        self.distil_transformer = tnn.Module()
        self.distil_transformer.transformer = tnn.TransformerEncoder(
            layer, 4)
        self.img_mlp_head = tnn.Sequential(
            tnn.Linear(896, 512), tnn.GELU(), tnn.Linear(512, 128),
            tnn.GELU(), tnn.Linear(128, n_classes))
        self.seq_len = seq_len

    def forward(self, vid):
        # vid (B, S, 12, 3, 112, 112); CLS clip prepended per sample
        b = vid.shape[0]
        cls = self.vid_cls.expand(b, -1, -1, -1, -1).unsqueeze(1)
        x = torch.cat([cls, vid], dim=1)               # (B, S+1, 12, 3, ...)
        x = x.reshape(-1, 12, 3, 112, 112).transpose(1, 2)  # (BS, 3, 12, ...)
        feats = self.vid_model.backbone(x)              # (B*(S+1), 896)
        feats = feats.reshape(b, self.seq_len + 1, 896)
        h = self.position_encoder(feats.transpose(0, 1))     # seq-major
        h = self.distil_transformer.transformer(h)
        return self.img_mlp_head(h.transpose(0, 1)[:, 0])


def test_frame_transformer_vid_whole_network_parity():
    torch.manual_seed(2)
    seq_len = 2
    tm = _TFrameTransformerVid(seq_len=seq_len).eval()
    _randomize_bn(tm.vid_model.backbone)
    vid = torch.randn(1, seq_len, 12, 3, 112, 112)
    with torch.no_grad():
        ref = tm(vid).numpy()

    sd = {f"vid_model.backbone.{k}": v
          for k, v in tm.vid_model.backbone.state_dict().items()}
    sd["vid_cls"] = tm.vid_cls.detach()
    sd.update({f"distil_transformer.transformer.{k}": v for k, v in
               tm.distil_transformer.transformer.state_dict().items()})
    sd.update({f"img_mlp_head.{k}": v
               for k, v in tm.img_mlp_head.state_dict().items()})
    variables = lightning_import.frame_transformer(sd)

    model = FrameTransformer(model="vid", seq_len=seq_len, frame_len=12,
                             n_classes=19, attention_impl="xla")
    vid_j = jnp.asarray(vid.numpy().transpose(0, 1, 2, 4, 5, 3))  # →(...H,W,C)
    init = model.init({"params": jax.random.PRNGKey(0)},
                      img=None, vid=vid_j, train=False)
    # graft imported weights onto the init tree (import covers the reference
    # modules; the variants' extra heads keep their init values)
    params = jax.tree_util.tree_map(lambda x: x, init["params"])

    def deep_update(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                deep_update(dst[k], v)
            else:
                dst[k] = jnp.asarray(np.asarray(v))

    deep_update(params, variables["params"])
    bstats = init.get("batch_stats", {})
    deep_update(bstats, variables.get("batch_stats", {}))

    out = model.apply({"params": params, "batch_stats": bstats},
                      img=None, vid=vid_j, train=False)
    logits = np.asarray(out["logits"])
    rel = np.abs(logits - ref) / (np.abs(ref).max() + 1e-8)
    assert rel.max() < 1e-3, f"max rel err {rel.max():.2e}"


# ---------------------------------------------------------------------------
# FrameTransformer 'distil' variant: the reference's signature multi-modal
# distillation path (frame_transformer.py:136-140,182-244 *intent* — the
# checked-in img-side modules are commented out / the "sum" concat is
# ill-typed, so the assembly below implements the documented semantics the
# flax model also implements: video CLS appended to the image sequence as a
# trailing distil token, student + teacher logits from the shared MLP head).
# ---------------------------------------------------------------------------


class _TFrameTransformerDistil(tnn.Module):
    def __init__(self, seq_len=2, n_classes=19):
        super().__init__()
        vb = _TR2Plus1D18()
        vb.fc = tnn.Sequential(tnn.Linear(512, 896))
        self.vid_model = tnn.Module()
        self.vid_model.backbone = vb
        ib = _TResNet18()
        ib.fc = tnn.Sequential(tnn.Linear(512, 896))
        self.img_model = tnn.Module()
        self.img_model.backbone = ib
        self.vid_cls = tnn.Parameter(torch.rand(1, 12, 3, 112, 112))
        self.img_cls = tnn.Parameter(torch.rand(1, 3, 224, 224))
        self.position_encoder = _TPositionalEncoding(896, max_len=14)
        dl = tnn.TransformerEncoderLayer(896, 2, 512, dropout=0.0)
        self.distil_transformer = tnn.Module()
        self.distil_transformer.transformer = tnn.TransformerEncoder(dl, 4)
        sl = tnn.TransformerEncoderLayer(896, 4, 896, dropout=0.0)
        self.scene_transformer = tnn.Module()
        self.scene_transformer.transformer = tnn.TransformerEncoder(sl, 4)
        self.img_mlp_head = tnn.Sequential(
            tnn.Linear(896, 512), tnn.GELU(), tnn.Linear(512, 128),
            tnn.GELU(), tnn.Linear(128, n_classes))
        self.seq_len = seq_len

    def forward(self, img, vid):
        b = img.shape[0]
        # --- teacher (vid) path ---
        cls_v = self.vid_cls.expand(b, -1, -1, -1, -1).unsqueeze(1)
        v = torch.cat([cls_v, vid], dim=1)
        v = v.reshape(-1, 12, 3, 112, 112).transpose(1, 2)
        vf = self.vid_model.backbone(v).reshape(b, self.seq_len + 1, 896)
        h = self.position_encoder(vf.transpose(0, 1))
        h = self.distil_transformer.transformer(h)
        vid_cls = h.transpose(0, 1)[:, 0]
        teacher_logits = self.img_mlp_head(vid_cls)
        # --- student (img) path with the vid CLS appended as distil token ---
        cls_i = self.img_cls.expand(b, -1, -1, -1).unsqueeze(1)
        im = torch.cat([cls_i, img], dim=1).reshape(-1, 3, 224, 224)
        feats = self.img_model.backbone(im).reshape(b, self.seq_len + 1, 896)
        feats = torch.cat([feats, vid_cls.unsqueeze(1)], dim=1)
        h = self.position_encoder(feats.transpose(0, 1))
        h = self.scene_transformer.transformer(h)
        h = h.transpose(0, 1)
        return (self.img_mlp_head(h[:, 0]), self.img_mlp_head(h[:, -1]),
                teacher_logits)


def test_frame_transformer_distil_whole_network_parity():
    torch.manual_seed(4)
    seq_len = 2
    tm = _TFrameTransformerDistil(seq_len=seq_len).eval()
    _randomize_bn(tm.vid_model.backbone)
    _randomize_bn(tm.img_model.backbone)
    img = torch.randn(1, seq_len, 3, 224, 224)
    vid = torch.randn(1, seq_len, 12, 3, 112, 112)
    with torch.no_grad():
        ref_logits, ref_distil, ref_teacher = (
            t.numpy() for t in tm(img, vid))

    sd = {}
    for mod in ("vid_model.backbone", "img_model.backbone",
                "distil_transformer.transformer",
                "scene_transformer.transformer", "img_mlp_head"):
        obj = tm
        for part in mod.split("."):
            obj = getattr(obj, part)
        sd.update({f"{mod}.{k}": v for k, v in obj.state_dict().items()})
    sd["vid_cls"] = tm.vid_cls.detach()
    sd["img_cls"] = tm.img_cls.detach()
    variables = lightning_import.frame_transformer(sd)

    model = FrameTransformer(model="distil", seq_len=seq_len, frame_len=12,
                             n_classes=19, attention_impl="xla")
    img_j = jnp.asarray(img.numpy().transpose(0, 1, 3, 4, 2))
    vid_j = jnp.asarray(vid.numpy().transpose(0, 1, 2, 4, 5, 3))
    init = model.init({"params": jax.random.PRNGKey(0)},
                      img=img_j, vid=vid_j, train=False)
    params = jax.tree_util.tree_map(lambda x: x, init["params"])

    def deep_update(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                deep_update(dst[k], v)
            else:
                dst[k] = jnp.asarray(np.asarray(v))

    deep_update(params, variables["params"])
    bstats = init.get("batch_stats", {})
    deep_update(bstats, variables.get("batch_stats", {}))

    out = model.apply({"params": params, "batch_stats": bstats},
                      img=img_j, vid=vid_j, train=False)
    scale = np.abs(ref_logits).max() + 1e-8
    for got, want, name in ((out["logits"], ref_logits, "logits"),
                            (out["distil_logits"], ref_distil, "distil"),
                            (out["teacher_logits"], ref_teacher, "teacher")):
        rel = np.abs(np.asarray(got) - want) / scale
        assert rel.max() < 1e-3, f"{name}: max rel err {rel.max():.2e}"
