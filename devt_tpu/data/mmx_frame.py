"""MMX frame pipelines: raw images + clips per scene.

Two loaders share the packing logic:

  * :class:`MMXFrameDataModule` — streamed-pickle manifest of per-scene
    frame paths (src/dataloaders/mmx/MMX_Frame_dl.py:11-164): per scene a
    random 12-frame temporal slice at train / the first 12 at val
    (:144-150), one random frame per scene for the image stream (:154),
    zero-filled fixed tensors when scenes run out (:125-128).
  * :class:`MMXLightDataModule` — CSV corpus (``out.csv`` with ``img_root``
    and ``g1..g6`` genre columns, src/dataloaders/mmx/MMX_Light_dl.py:
    123-286): scenes/frames discovered by glob, filled by cycling frames
    and scenes modulo their counts (:254-286 — including the quirk that
    the reference cycles *scene* index ``i`` through both the scene list
    and the output slot, so short trailers repeat scenes).  19-genre
    multi-hot labels with Drama fallback at index 6 (:235-245).

Layouts are channels-last: ``img (S, 224, 224, 3)``,
``vid (S, 12, 112, 112, 3)`` float32.

This is the pipeline the DALI GPU-decode path was meant to feed
(MMX_Light_dl.py:26-120, commented out of ``setup``); here decode runs on
the host — PIL by default, the native C++ module (devt_tpu/native) when
built — sharded per host and overlapped with device steps via
devt_tpu/data/pipeline.py.
"""

from __future__ import annotations

import glob
import os
import random

import numpy as np
from PIL import Image

from devt_tpu.config import MMX_GENRES_19, Config
from devt_tpu.data import manifests, transforms
from devt_tpu.data.pipeline import Loader


def collect_labels_19(labels) -> np.ndarray:
    """19-genre multi-hot, Drama fallback index 6 (MMX_Light_dl.py:235-245)."""
    out = np.zeros(19, np.float32)
    for i, genre in enumerate(MMX_GENRES_19):
        if genre in labels:
            out[i] = 1.0
    if out.sum() == 0:
        out[6] = 1.0
    return out


def _pil_load(path: str) -> Image.Image:
    img = Image.open(path)
    return img.convert("RGB")


class _FrameClipPacker:
    """Shared fixed-shape packing for both frame loaders.

    The per-frame decode+resize+normalize loop — the hot loop the reference
    runs one PIL call at a time inside DataLoader workers
    (MMX_Light_dl.py:274-284) — is served by the native C++ batch decoder
    (devt_tpu/native.py, the DALI-equivalent) when built, with the PIL path
    as fallback and for augmented train images."""

    def __init__(self, config: Config, state: str):
        self.config = config
        self.state = state
        self.seq_len = config.seq_len
        self.frame_len = config.frame_len
        variants_with_vid = ("sum", "distil", "vid", "pre_modal",
                             "sum_residual", "post_sum")
        self.need_vid = config.model in variants_with_vid
        self.need_img = config.model != "vid"
        from devt_tpu import native

        self.native = native if native.available() else None
        # u8 wire format (config.wire_format): ship decoded pixels as
        # uint8 and normalize on device (data/device_norm.py) — 4x fewer
        # bytes over the host→device link.  RandomErasing (erase to 0 in
        # normalized space, the torchvision default) has a u8 twin that
        # fills round(mean*255), so erasing configs keep the u8 wire.
        self.vid_u8 = (config.wire_format == "u8"
                       and self.native is not None and self.need_vid)
        # u8 padding value: round(mean*255), which the on-device
        # normalize maps to ~0 — matching the f32 wire's normalized-space
        # zeros for empty/missing slots (train/serve parity across wire
        # formats, ADVICE r2)
        self._u8_fill = np.round(
            transforms.KINETICS_MEAN * 255.0).astype(np.uint8)

    def empty(self):
        img = np.zeros((self.seq_len, 224, 224, 3), np.float32)
        if self.vid_u8:
            vid = np.broadcast_to(
                self._u8_fill,
                (self.seq_len, self.frame_len, 112, 112, 3)).copy()
        else:
            vid = np.zeros((self.seq_len, self.frame_len, 112, 112, 3),
                           np.float32)
        return img, vid

    def sample_dict(self, label, img, vid) -> dict:
        """Batch fragment with only the modalities the model consumes —
        an all-zeros unused tensor still costs host→device bytes."""
        out = {"label": label}
        if self.need_img:
            out["img"] = img
        if self.need_vid:
            out["vid"] = vid
        return out

    def item_spec(self) -> dict:
        """Per-sample (shape, dtype) map — the Loader fill-into contract
        (data/pipeline.py): samples pack straight into their batch slot,
        skipping the collate stack copy."""
        spec = {"label": ((19,), np.float32)}
        if self.need_img:
            spec["img"] = ((self.seq_len, 224, 224, 3), np.float32)
        if self.need_vid:
            spec["vid"] = ((self.seq_len, self.frame_len, 112, 112, 3),
                           np.uint8 if self.vid_u8 else np.float32)
        return spec

    def init_into(self, out: dict) -> None:
        """Initialise a batch slot exactly like :meth:`empty` (zeros /
        u8 mean-fill) before the scene loop packs into it."""
        if "img" in out:
            out["img"][...] = 0.0
        if "vid" in out:
            out["vid"][...] = self._u8_fill if self.vid_u8 else 0.0

    def pack_scene(self, img, vid, slot: int, frame_paths: list[str],
                   rng: random.Random, cycle: bool):
        train = self.state == "train"
        n = len(frame_paths)
        if n == 0:
            return
        if self.need_vid:
            if cycle:
                # MMX_Light cycles k through the frame list (:268-276)
                idxs = [k % n for k in range(self.frame_len)]
            elif train and n > self.frame_len:
                start = rng.randint(0, n - self.frame_len - 1) \
                    if n > self.frame_len + 1 else 0
                idxs = list(range(start, start + self.frame_len))
            else:
                idxs = [min(k, n - 1) for k in range(self.frame_len)]
            erase = train and not cycle
            if self.vid_u8:
                # decode straight into the slot (native out= contract)
                frames, status = self.native.load_batch_u8(
                    [frame_paths[fi] for fi in idxs], 120, 112,
                    out=vid[slot])
                if np.any(status):
                    # failed decodes: mean-fill (≈0 after device norm),
                    # matching the f32 wire's zero-fill fault tolerance
                    frames[status != 0] = self._u8_fill
                if erase:
                    transforms.random_erasing_clip_u8(frames, rng)
            elif self.native is not None:
                frames, _ = self.native.load_batch_f32(
                    [frame_paths[fi] for fi in idxs], 120, 112,
                    transforms.KINETICS_MEAN, transforms.KINETICS_STD,
                    out=vid[slot])
                if erase:
                    transforms.random_erasing_clip(frames, rng)
            else:
                for k, fi in enumerate(idxs):
                    vid[slot, k] = transforms.clip_frame_transform(
                        _pil_load(frame_paths[fi]), rng, train=train,
                        erase=erase)
        if self.need_img:
            pick = frame_paths[rng.randint(0, n - 1)] if train \
                else frame_paths[0]
            if train:
                # augmented path stays on PIL (AutoAugment needs PIL kernels)
                img[slot] = transforms.train_image_transform(
                    _pil_load(pick), rng)
            elif self.native is not None:
                out = self.native.load_image_f32(
                    pick, 230, 224, transforms.IMAGENET_MEAN,
                    transforms.IMAGENET_STD)
                if out is not None:
                    img[slot] = out
            else:
                img[slot] = transforms.val_image_transform(_pil_load(pick))


class _WholeClipPacker:
    """ViViT whole-clip samples from a frame corpus.

    The reference never pairs ViViT with a dataloader (vit.py is
    self-contained, :133-144); here the flagship model trains on the same
    frame corpora as the FrameTransformer family: one ``frame_len``-frame
    224² clip per trailer, frames drawn across its scenes in order
    (random contiguous window at train, evenly spaced at val/test).

    Wire formats (config.wire_format): ``"f32"`` normalized pixels,
    ``"u8"`` raw pixels normalized on device, or ``"u8_tokens"`` —
    pre-patchified ViT tokens the native loader emits at decode time
    (native/devt_host.cpp:devt_load_batch_u8_patches), so the device
    step skips the conv patch embed entirely.  Without the native
    library both u8 wires fall back to f32 pixels via PIL."""

    RESIZE, CROP, PATCH = 240, 224, 16

    def __init__(self, config: Config, state: str):
        self.config = config
        self.state = state
        self.frame_len = config.frame_len
        from devt_tpu import native

        self.native = native if native.available() else None
        self.wire = (config.wire_format if self.native is not None
                     else "f32")
        self._u8_fill = np.round(
            transforms.KINETICS_MEAN * 255.0).astype(np.uint8)

    def _clip_paths(self, frame_paths: list[str],
                    rng: random.Random) -> list[str]:
        t, n = self.frame_len, len(frame_paths)
        if self.state == "train" and n > t:
            start = rng.randint(0, n - t)
            return frame_paths[start:start + t]
        # evenly spaced, deterministic (repeats frames when n < t)
        return [frame_paths[min(k * n // t, n - 1)] for k in range(t)]

    def sample(self, frame_paths: list[str], label: np.ndarray,
               rng: random.Random) -> dict:
        t, g = self.frame_len, self.CROP // self.PATCH
        if not frame_paths:
            if self.wire == "u8_tokens":
                vid = np.broadcast_to(
                    np.tile(self._u8_fill, self.PATCH * self.PATCH),
                    (t, g * g, self.PATCH * self.PATCH * 3)).copy()
                return {"vid_tokens": vid, "label": label}
            if self.wire == "u8":
                vid = np.broadcast_to(
                    self._u8_fill, (t, self.CROP, self.CROP, 3)).copy()
                return {"vid": vid, "label": label}
            return {"vid": np.zeros((t, self.CROP, self.CROP, 3),
                                    np.float32), "label": label}
        paths = self._clip_paths(frame_paths, rng)
        if self.wire == "u8_tokens":
            tok, status = self.native.load_batch_u8_patches(
                paths, self.RESIZE, self.CROP, self.PATCH)
            if np.any(status):
                tok[status != 0] = np.tile(
                    self._u8_fill, self.PATCH * self.PATCH)
            return {"vid_tokens": tok, "label": label}
        if self.wire == "u8":
            pix, status = self.native.load_batch_u8(
                paths, self.RESIZE, self.CROP)
            if np.any(status):
                pix[status != 0] = self._u8_fill
            return {"vid": pix, "label": label}
        if self.native is not None:
            pix, _ = self.native.load_batch_f32(
                paths, self.RESIZE, self.CROP,
                transforms.KINETICS_MEAN, transforms.KINETICS_STD)
            return {"vid": pix, "label": label}
        vid = np.stack([
            transforms.clip_frame_transform(_pil_load(p), rng,
                                            size=self.CROP,
                                            resize=self.RESIZE)
            for p in paths])
        return {"vid": vid, "label": label}

    def item_spec(self) -> dict:
        """Loader fill-into contract (data/pipeline.py)."""
        t, g = self.frame_len, self.CROP // self.PATCH
        spec = {"label": ((19,), np.float32)}
        if self.wire == "u8_tokens":
            spec["vid_tokens"] = ((t, g * g, self.PATCH * self.PATCH * 3),
                                  np.uint8)
        else:
            spec["vid"] = ((t, self.CROP, self.CROP, 3),
                           np.uint8 if self.wire == "u8" else np.float32)
        return spec

    def sample_into(self, frame_paths: list[str], label: np.ndarray,
                    rng: random.Random, out: dict) -> None:
        """Like :meth:`sample` but the native decoder writes the clip
        STRAIGHT into the batch slot — zero intermediate copies from
        JPEG/PNG bytes to the wire buffer."""
        out["label"][...] = label
        if not frame_paths or self.native is None:
            for k, v in self.sample(frame_paths, label, rng).items():
                out[k][...] = v
            return
        paths = self._clip_paths(frame_paths, rng)
        if self.wire == "u8_tokens":
            tok, status = self.native.load_batch_u8_patches(
                paths, self.RESIZE, self.CROP, self.PATCH,
                out=out["vid_tokens"])
            if np.any(status):
                tok[status != 0] = np.tile(
                    self._u8_fill, self.PATCH * self.PATCH)
        elif self.wire == "u8":
            pix, status = self.native.load_batch_u8(
                paths, self.RESIZE, self.CROP, out=out["vid"])
            if np.any(status):
                pix[status != 0] = self._u8_fill
        else:
            self.native.load_batch_f32(
                paths, self.RESIZE, self.CROP, transforms.KINETICS_MEAN,
                transforms.KINETICS_STD, out=out["vid"])


class MMXFrameDataset:
    """Pickle-manifest variant (MMX_Frame_dl.py:53-164)."""

    def __init__(self, df, config: Config, state: str = "train"):
        self.df = df
        self.config = config
        self.state = state
        self.whole_clip = config.model == "vivit"
        self.packer = (_WholeClipPacker(config, state) if self.whole_clip
                       else _FrameClipPacker(config, state))

    def __len__(self) -> int:
        return len(self.df)

    def _rng(self, idx: int) -> random.Random:
        return random.Random(hash((self.config.seed, self.state, idx,
                                   random.random()
                                   if self.state == "train" else 0)))

    def _pack_scenes(self, scenes, img, vid, rng) -> None:
        slot = 0
        for scene in scenes.values():
            if slot >= self.config.seq_len:
                break
            clip = None
            for key in (0, "000", "0"):
                try:
                    clip = scene[key]
                    break
                except (KeyError, TypeError, IndexError):
                    continue
            if not clip:
                continue
            self.packer.pack_scene(img, vid, slot, list(clip), rng,
                                   cycle=False)
            slot += 1

    def _whole_clip_frames(self, scenes) -> list:
        frames = []
        for scene in scenes.values():
            for key in (0, "000", "0"):
                try:
                    frames.extend(scene[key])
                    break
                except (KeyError, TypeError, IndexError):
                    continue
        return frames

    @property
    def item_spec(self):
        """Loader fill-into contract (data/pipeline.py)."""
        return self.packer.item_spec()

    def getitem_into(self, idx: int, out: dict) -> None:
        rng = self._rng(idx)
        label = np.asarray(
            collect_labels_19(self.df.at[idx, "label"]), np.float32)
        scenes = self.df.at[idx, "scenes"]
        if self.whole_clip:
            self.packer.sample_into(self._whole_clip_frames(scenes),
                                    label, rng, out)
            return
        self.packer.init_into(out)
        self._pack_scenes(scenes, out.get("img"), out.get("vid"), rng)
        out["label"][...] = label

    def __getitem__(self, idx: int):
        rng = self._rng(idx)
        label = self.df.at[idx, "label"]
        scenes = self.df.at[idx, "scenes"]
        if self.whole_clip:
            return self.packer.sample(
                self._whole_clip_frames(scenes),
                np.asarray(collect_labels_19(label), np.float32), rng)
        img, vid = self.packer.empty()
        self._pack_scenes(scenes, img, vid, rng)
        return self.packer.sample_dict(
            np.asarray(collect_labels_19(label), np.float32), img, vid)


class MMXLightDataset:
    """CSV/glob variant (MMX_Light_dl.py:174-286)."""

    def __init__(self, df, config: Config, state: str = "train"):
        self.df = df
        self.config = config
        self.state = state
        self.whole_clip = config.model == "vivit"
        self.packer = (_WholeClipPacker(config, state) if self.whole_clip
                       else _FrameClipPacker(config, state))

    def __len__(self) -> int:
        return len(self.df)

    def _rng(self, idx: int) -> random.Random:
        return random.Random(hash((self.config.seed, self.state, idx,
                                   random.random()
                                   if self.state == "train" else 0)))

    def _row_target_scenes(self, idx: int):
        row = self.df.iloc[idx]
        labels = [row[f"g{i}"] for i in range(1, 6) if f"g{i}" in row]
        target = collect_labels_19([l for l in labels if isinstance(l, str)])
        scenes = sorted(glob.glob(os.path.join(str(row["img_root"]), "*")))
        return np.asarray(target, np.float32), scenes

    def _pack_scenes(self, scenes, img, vid, rng) -> None:
        if not scenes:
            return
        frame_lists = [sorted(glob.glob(os.path.join(s, "*.png")))
                       or sorted(glob.glob(os.path.join(s, "*")))
                       for s in scenes]
        for slot in range(self.config.seq_len):
            frames = frame_lists[slot % len(scenes)]
            self.packer.pack_scene(img, vid, slot, frames, rng, cycle=True)

    def _whole_clip_frames(self, scenes) -> list:
        frames = []
        for s in scenes:
            frames.extend(sorted(glob.glob(os.path.join(s, "*.png")))
                          or sorted(glob.glob(os.path.join(s, "*"))))
        return frames

    @property
    def item_spec(self):
        """Loader fill-into contract (data/pipeline.py)."""
        return self.packer.item_spec()

    def getitem_into(self, idx: int, out: dict) -> None:
        rng = self._rng(idx)
        target, scenes = self._row_target_scenes(idx)
        if self.whole_clip:
            self.packer.sample_into(self._whole_clip_frames(scenes),
                                    target, rng, out)
            return
        self.packer.init_into(out)
        self._pack_scenes(scenes, out.get("img"), out.get("vid"), rng)
        out["label"][...] = target

    def __getitem__(self, idx: int):
        rng = self._rng(idx)
        target, scenes = self._row_target_scenes(idx)
        if self.whole_clip:
            return self.packer.sample(self._whole_clip_frames(scenes),
                                      target, rng)
        img, vid = self.packer.empty()
        self._pack_scenes(scenes, img, vid, rng)
        return self.packer.sample_dict(target, img, vid)


class MMXFrameDataModule:
    def __init__(self, train_manifest: str, val_manifest: str,
                 config: Config):
        self.train_manifest = train_manifest
        self.val_manifest = val_manifest
        self.config = config

    def setup(self):
        self.train_df = manifests.load_manifest(self.train_manifest)
        self.val_df = manifests.load_manifest(self.val_manifest)
        self.train_steps = len(self.train_df) // self.config.batch_size
        return self

    def train_batches(self):
        return Loader(MMXFrameDataset(self.train_df, self.config, "train"),
                      self.config.batch_size, shuffle=True,
                      seed=self.config.seed)

    def val_batches(self):
        return Loader(MMXFrameDataset(self.val_df, self.config, "val"),
                      self.config.batch_size)

    def test_batches(self):
        return Loader(MMXFrameDataset(self.val_df, self.config, "test"),
                      self.config.batch_size)


class MMXLightDataModule:
    def __init__(self, csv_path: str, config: Config):
        self.csv_path = csv_path
        self.config = config

    def setup(self):
        self.train_df, self.val_df = manifests.load_csv_manifest(
            self.csv_path, shuffle_seed=self.config.seed)
        self.train_steps = len(self.train_df) // self.config.batch_size
        return self

    def train_batches(self):
        return Loader(MMXLightDataset(self.train_df, self.config, "train"),
                      self.config.batch_size, shuffle=True,
                      seed=self.config.seed)

    def val_batches(self):
        return Loader(MMXLightDataset(self.val_df, self.config, "val"),
                      self.config.batch_size)

    def test_batches(self):
        return Loader(MMXLightDataset(self.val_df, self.config, "val"),
                      self.config.batch_size)
