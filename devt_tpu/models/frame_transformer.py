"""Frame/clip transformer with multi-modal distillation.

Capability twin of the reference's primary model
(src/models/frame_transformer.py:83-368), dispatching on the ``model``
config string exactly like the reference ``forward``
(src/frame_transformer.py:136-180):

  * ``vid``         — clip stream only: R(2+1)D-18 per scene-clip → 896-d,
                      learned clip-shaped CLS prepended, sinusoidal PE,
                      4-layer/2-head ``distil_transformer``, CLS → MLP head
                      (frame_transformer.py:177-180,192-210).
  * ``frame``       — image stream only: frozen ResNet-18 per frame → 896-d,
                      image-shaped CLS, PE, ``scene_transformer``, CLS →
                      MLP head (frame_transformer.py:169-171,212-244).
  * ``distil``      — multi-modal distillation: the video CLS embedding is
                      injected as a token into the image sequence; the
                      student's distil-token logits are trained with CE
                      against the argmax of the teacher (video) logits,
                      plus BCE on the image CLS logits
                      (frame_transformer.py:139-141,182-185,246-258).
  * ``sum``         — image CLS + distil token summed, then the MLP head
                      (frame_transformer.py:143-147).
  * ``post_sum``    — image CLS + video CLS summed, then head
                      (frame_transformer.py:163-167).
  * ``sum_residual``— L2-normalised image and video CLS summed, then head
                      (frame_transformer.py:149-161).
  * ``pre_modal``   — per-clip video features added to per-frame image
                      features *before* the scene transformer
                      (frame_transformer.py:173-175,187-190,202-203,220-221).

Reference-bug triage (SURVEY.md §7 "hard parts" #5 — evident intent
implemented, originals cited):
  * ``scene_transformer`` and ``img_cls`` are referenced but commented out
    of ``__init__`` (frame_transformer.py:98,104,231) — both instantiated
    here with the commented hyperparameters.
  * In ``distil`` mode the reference computes BCE between a 896-d embedding
    and 19-d targets (frame_transformer.py:250-252) — here the MLP head maps
    every token embedding to logits first.
  * ``pre_modal`` vs ``pre-modal`` string mismatch (frame_transformer.py:
    202,220) — one spelling, ``pre_modal``.
  * ``sum_residual`` normalises ``img_cls`` twice (frame_transformer.py:158)
    — here each modality is normalised once.

Layouts are channels-last (TPU-native): ``img (B, S, H, W, C)``,
``vid (B, S, T, H, W, C)``.  The reference's per-sample Python CLS-concat
loops (frame_transformer.py:193-196,213-216) become a broadcast+concat.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from devt_tpu.models.layers import GeluMlp, PositionalEncoding
from devt_tpu.models.r2plus1d import r2plus1d_18
from devt_tpu.models.resnet import resnet18
from devt_tpu.models.torch_encoder import TorchTransformerEncoder

VARIANTS = ("vid", "frame", "distil", "sum", "post_sum", "sum_residual",
            "pre_modal", "frame_transformer")


class FrameTransformer(nn.Module):
    model: str = "vid"
    seq_len: int = 13            # scene tokens before the CLS prepend
    frame_len: int = 12          # frames per scene clip
    n_classes: int = 19
    embed_dim: int = 896
    use_cls: bool = True
    freeze_img: bool = True      # reference runs ImgResNet under no_grad
    img_size: int = 224
    vid_size: int = 112
    # the reference hardcodes 0.5 in its PE and both encoders
    # (frame_transformer.py:91-99) — that stays the parity default; the
    # knob exists so training setups (and the convergence tests) can
    # tune it without forking the model
    dropout: float = 0.5
    attention_impl: str = "auto"
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.model in VARIANTS, f"unknown variant {self.model!r}"
        e = self.embed_dim
        max_len = self.seq_len + (1 if self.use_cls else 0)

        self.vid_backbone = r2plus1d_18(output="features", dtype=self.dtype)
        self.vid_fc = nn.Dense(e, dtype=self.dtype, name="vid_fc")
        self.img_backbone = resnet18(output="features", dtype=self.dtype)
        self.img_fc = nn.Dense(e, dtype=self.dtype, name="img_fc")

        # PositionalEncoding(896, 0.5, max_len=14) — frame_transformer.py:91-93
        self.position_encoder = PositionalEncoding(
            e, dropout=self.dropout, max_len=max_len + 1,
            name="position_encoder")
        # TransformerBase(896, 128, 2, 512, 4, 0.5) — frame_transformer.py:99
        self.distil_transformer = TorchTransformerEncoder(
            e, 2, 512, 4, dropout=self.dropout,
            attention_impl=self.attention_impl,
            remat=self.remat, dtype=self.dtype, name="distil_transformer")
        # TransformerBase(896, 896, 4, 896, 4, 0.5) — frame_transformer.py:98
        self.scene_transformer = TorchTransformerEncoder(
            e, 4, 896, 4, dropout=self.dropout,
            attention_impl=self.attention_impl,
            remat=self.remat, dtype=self.dtype, name="scene_transformer")

        if self.use_cls:
            # learned clip-shaped / image-shaped CLS tokens
            # (frame_transformer.py:104-105), channels-last here
            self.vid_cls = self.param(
                "vid_cls", nn.initializers.uniform(scale=1.0),
                (self.frame_len, self.vid_size, self.vid_size, 3))
            self.img_cls = self.param(
                "img_cls", nn.initializers.uniform(scale=1.0),
                (self.img_size, self.img_size, 3))

        # 896→512→128→n_classes with GELU — frame_transformer.py:106
        self.img_mlp_head = GeluMlp(features=(512, 128, self.n_classes),
                                    dtype=self.dtype, name="img_mlp_head")

    # ------------------------------------------------------------------
    def _encode_clips(self, vid, train: bool):
        """(B, S', T, H, W, C) → (B, S', 896) via the video backbone."""
        b, s = vid.shape[:2]
        flat = vid.reshape((b * s,) + vid.shape[2:])
        feats = self.vid_backbone(flat.astype(self.dtype), train=train)
        feats = self.vid_fc(feats)
        return feats.reshape(b, s, -1)

    def _encode_frames(self, img, train: bool):
        """(B, S', H, W, C) → (B, S', 896) via the frozen image backbone."""
        b, s = img.shape[:2]
        flat = img.reshape((b * s,) + img.shape[2:])
        # The whole ImgResNet forward (backbone + new fc) runs under
        # no_grad in the reference (frame_transformer.py:57-61).
        feats = self.img_backbone(flat.astype(self.dtype), train=False)
        feats = self.img_fc(feats)
        if self.freeze_img:
            feats = jax.lax.stop_gradient(feats)
        return feats.reshape(b, s, -1)

    def _prepend_cls_clip(self, vid):
        b = vid.shape[0]
        cls = jnp.broadcast_to(self.vid_cls.astype(vid.dtype)[None, None],
                               (b, 1) + self.vid_cls.shape)
        return jnp.concatenate([cls, vid], axis=1)

    def _prepend_cls_img(self, img):
        b = img.shape[0]
        cls = jnp.broadcast_to(self.img_cls.astype(img.dtype)[None, None],
                               (b, 1) + self.img_cls.shape)
        return jnp.concatenate([cls, img], axis=1)

    # ------------------------------------------------------------------
    def vid_step(self, vid, train: bool = False, pooled: bool = True):
        """Video pathway (frame_transformer.py:192-210).

        vid: (B, S, T, H, W, C).  ``pooled=False`` returns the per-clip
        features before the temporal transformer (the ``pre_modal`` tap,
        frame_transformer.py:202-203).
        """
        if self.use_cls:
            vid = self._prepend_cls_clip(vid)
        feats = self._encode_clips(vid, train)          # (B, S', 896)
        if not pooled:
            return feats
        h = self.position_encoder(feats, deterministic=not train)
        h = self.distil_transformer(h, deterministic=not train)
        return h[:, 0]                                   # video CLS

    def img_step(self, img, inject=None, train: bool = False,
                 inject_mode: str = "append"):
        """Image pathway (frame_transformer.py:212-244).

        img: (B, S, H, W, C).  ``inject`` is an optional (B, 896) embedding:
        ``inject_mode="append"`` adds it as a trailing token (the distil/sum
        injection, frame_transformer.py:226), ``"add"`` sums it into every
        frame feature (pre_modal, frame_transformer.py:220-221, where it is
        (B, S', 896)).  Returns (cls, tokens).
        """
        if self.use_cls:
            img = self._prepend_cls_img(img)
        feats = self._encode_frames(img, train)          # (B, S', 896)
        if inject is not None and inject_mode == "add":
            feats = feats + inject
        if inject is not None and inject_mode == "append":
            feats = jnp.concatenate([feats, inject[:, None, :]], axis=1)
        h = self.position_encoder(feats, deterministic=not train)
        h = self.scene_transformer(h, deterministic=not train)
        return h[:, 0], h

    # ------------------------------------------------------------------
    def __call__(self, img=None, vid=None, train: bool = False
                 ) -> dict[str, Any]:
        """Variant dispatch (frame_transformer.py:136-180).

        Returns a dict: always ``logits``; distillation variants add
        ``distil_logits`` (student) and ``teacher_logits``.
        """
        m = self.model
        if m == "vid":
            vid_cls = self.vid_step(vid, train)
            return {"logits": self.img_mlp_head(vid_cls), "embedding": vid_cls}

        if m in ("frame", "frame_transformer"):
            cls, _ = self.img_step(img, train=train)
            return {"logits": self.img_mlp_head(cls), "embedding": cls}

        if m == "distil":
            vid_cls = self.vid_step(vid, train)
            teacher_logits = self.img_mlp_head(vid_cls)
            cls, tokens = self.img_step(img, inject=vid_cls, train=train)
            distil_tkn = tokens[:, -1]
            return {"logits": self.img_mlp_head(cls),
                    "distil_logits": self.img_mlp_head(distil_tkn),
                    "teacher_logits": teacher_logits,
                    "embedding": cls}

        if m == "sum":
            vid_cls = self.vid_step(vid, train)
            cls, tokens = self.img_step(img, inject=vid_cls, train=train)
            distil_tkn = tokens[:, -1]
            return {"logits": self.img_mlp_head(cls + distil_tkn),
                    "embedding": cls + distil_tkn}

        if m == "post_sum":
            vid_cls = self.vid_step(vid, train)
            cls, _ = self.img_step(img, inject=vid_cls, train=train)
            return {"logits": self.img_mlp_head(cls + vid_cls),
                    "embedding": cls + vid_cls}

        if m == "sum_residual":
            vid_cls = self.vid_step(vid, train)
            cls, _ = self.img_step(img, train=train)

            def _norm(x):
                return x / jnp.maximum(
                    jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)

            embed = _norm(cls) + _norm(vid_cls)
            return {"logits": self.img_mlp_head(embed), "embedding": embed}

        if m == "pre_modal":
            clip_feats = self.vid_step(vid, train, pooled=False)
            cls, _ = self.img_step(img, inject=clip_feats, train=train,
                                   inject_mode="add")
            return {"logits": self.img_mlp_head(cls), "embedding": cls}

        raise ValueError(f"unknown variant {m!r}")
