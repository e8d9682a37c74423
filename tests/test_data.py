"""Data pipeline tests over synthetic corpora (no real NFS data needed —
the fixture generators stand in for the reference's missing fixtures)."""

import random

import numpy as np
import pytest

from devt_tpu.config import Config
from devt_tpu.data import synthetic, transforms
from devt_tpu.data.contrastive import ContrastiveDataModule
from devt_tpu.data.mit_temporal import MITDataModule
from devt_tpu.data.mmx_frame import MMXLightDataModule, collect_labels_19
from devt_tpu.data.mmx_temporal import MMXDataModule, collect_labels_15
from devt_tpu.data.pipeline import Loader
from devt_tpu.data.samplers import weighted_sampler


# ---------------------------------------------------------------------------
# label packing
# ---------------------------------------------------------------------------


def test_labels_15_drama_fallback():
    lab = collect_labels_15(["NotAGenre"])
    assert lab[5] == 1.0 and lab.sum() == 1.0          # Drama fallback
    lab = collect_labels_15(["Action", "War"])
    assert lab[0] == 1.0 and lab[14] == 1.0 and lab.sum() == 2.0


def test_labels_19_drama_fallback():
    lab = collect_labels_19(["Zzz"])
    assert lab[6] == 1.0 and lab.sum() == 1.0


# ---------------------------------------------------------------------------
# datamodules over synthetic corpora
# ---------------------------------------------------------------------------


def test_mmx_temporal_module(tmp_path):
    train, val = synthetic.write_fake_expert_corpus(str(tmp_path))
    cfg = Config(data_set="mmx", model="ptn", batch_size=2, seq_len=5,
                 experts=("img-embeddings", "location-embeddings",
                          "video-embeddings"))
    dm = MMXDataModule(train, val, cfg).setup()
    batch = next(iter(dm.train_batches()))
    assert batch["experts"].shape == (2, 5, 3, 2048)
    assert batch["label"].shape == (2, 15)
    assert batch["experts"].dtype == np.float32
    # val path must hit "test-"-prefixed experts and stay finite
    vbatch = next(iter(dm.val_batches()))
    assert np.isfinite(vbatch["experts"]).all()
    # video expert is 512-wide on disk — zero-pad to 2048 means the tail
    # of that expert is exactly zero at val (no train noise)
    assert np.all(vbatch["experts"][:, :, 2, 512:] == 0)


def test_mmx_temporal_concat_mixing(tmp_path):
    train, val = synthetic.write_fake_expert_corpus(str(tmp_path))
    cfg = Config(model="ptn", batch_size=2, seq_len=4,
                 mixing_method="concat",
                 experts=("img-embeddings", "location-embeddings"))
    dm = MMXDataModule(train, val, cfg).setup()
    batch = next(iter(dm.train_batches()))
    assert batch["experts"].shape == (2, 4, 1, 4096)


def test_mit_temporal_module(tmp_path):
    train, val = synthetic.write_fake_mit_corpus(str(tmp_path))
    cfg = Config(data_set="mit", model="ptn", batch_size=2, cls=1,
                 experts=("img-embeddings", "location-embeddings"))
    dm = MITDataModule(train, val, cfg).setup()
    batch = next(iter(dm.train_batches()))
    assert batch["experts"].shape == (2, 4, 2, 2048)   # 3 + CLS
    assert batch["label"].dtype == np.int32
    # repeat-padding: fewer chunks than target repeats the first row —
    # with cls the first row is the random CLS vector
    vb = next(iter(dm.val_batches()))
    assert np.isfinite(vb["experts"]).all()


def test_mmx_light_module(tmp_path):
    csv_path = synthetic.write_fake_light_csv(str(tmp_path), n_movies=4)
    cfg = Config(data_set="mmx-frame", model="vid", batch_size=2, seq_len=4,
                 frame_len=6)
    dm = MMXLightDataModule(csv_path, cfg)
    dm.config = cfg
    # tiny corpus: override the reference's 6047-row split
    from devt_tpu.data import manifests
    df_train, df_val = manifests.load_csv_manifest(csv_path, train_rows=3,
                                                   val_rows=1)
    dm.train_df, dm.val_df = df_train, df_val
    dm.train_steps = 1
    from devt_tpu.data.mmx_frame import MMXLightDataset
    ds = MMXLightDataset(df_train, cfg, state="train")
    item = ds[0]
    assert item["vid"].shape == (4, 6, 112, 112, 3)
    assert item["label"].shape == (19,)
    assert np.isfinite(item["vid"]).all()
    # scenes cycle modulo scene count: slot 3 repeats scene 0 for a
    # 3-scene movie (MMX_Light_dl.py:254-286 cycling semantics)
    loader = Loader(ds, 2, num_workers=2)
    batch = next(iter(loader))
    assert batch["vid"].shape == (2, 4, 6, 112, 112, 3)


def test_contrastive_module(tmp_path):
    train, val = synthetic.write_fake_expert_corpus(str(tmp_path))
    cfg = Config(model="contrastive", batch_size=2, aggregation="none",
                 input_shape=2048,
                 experts=("img-embeddings", "location-embeddings"))
    dm = ContrastiveDataModule(train, val, cfg).setup()
    batch = next(iter(dm.train_batches()))
    assert batch["x_i"].shape == (2, 2048)
    assert batch["x_j"].shape == (2, 2048)
    assert not np.allclose(batch["x_i"], batch["x_j"])


def test_contrastive_concat_aggregation(tmp_path):
    train, val = synthetic.write_fake_expert_corpus(str(tmp_path))
    cfg = Config(model="contrastive", batch_size=2, aggregation="concat",
                 input_shape=4096,
                 experts=("img-embeddings", "location-embeddings"))
    dm = ContrastiveDataModule(train, val, cfg).setup()
    batch = next(iter(dm.train_batches()))
    assert batch["x_i"].shape == (2, 4096)


# ---------------------------------------------------------------------------
# pipeline mechanics
# ---------------------------------------------------------------------------


class _Range:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((3,), i, np.float32), "idx": np.int32(i)}


def test_loader_per_host_sharding_disjoint():
    ds = _Range(64)
    seen = []
    for rank in range(4):
        loader = Loader(ds, 4, shuffle=True, seed=7, num_workers=1,
                        process_index=rank, process_count=4)
        idxs = [int(i) for b in loader for i in b["idx"]]
        assert len(idxs) == 16
        seen.append(set(idxs))
    all_seen = set().union(*seen)
    assert len(all_seen) == 64            # full coverage
    for a in range(4):
        for b in range(a + 1, 4):
            assert not (seen[a] & seen[b])   # disjoint shards


def test_loader_drop_last_and_shapes():
    loader = Loader(_Range(10), 4, num_workers=1, process_index=0,
                    process_count=1)
    batches = list(loader)
    assert len(batches) == 2              # drop_last
    assert batches[0]["x"].shape == (4, 3)


def test_weighted_sampler_balances():
    labels = [0] * 90 + [1] * 10
    sampler = weighted_sampler(labels)
    rng = np.random.default_rng(0)
    idx = sampler(rng)
    drawn = np.asarray(labels)[idx]
    frac1 = (drawn == 1).mean()
    assert 0.35 < frac1 < 0.65            # ~balanced despite 9:1 skew


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def test_image_transforms_shapes_and_stats():
    from PIL import Image

    rng = random.Random(0)
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (100, 140, 3),
                                          dtype=np.uint8))
    train = transforms.train_image_transform(img, rng)
    assert train.shape == (224, 224, 3) and train.dtype == np.float32
    val = transforms.val_image_transform(img)
    assert val.shape == (224, 224, 3)
    clip = transforms.clip_frame_transform(img, rng, train=True, erase=True)
    assert clip.shape == (112, 112, 3)
    # normalization: a mid-gray pixel lands near -mean/std
    gray = Image.fromarray(np.full((64, 64, 3), 128, np.uint8))
    out = transforms.val_image_transform(gray, size=32, resize=40)
    expected = (128 / 255.0 - transforms.IMAGENET_MEAN) / \
        transforms.IMAGENET_STD
    np.testing.assert_allclose(out[0, 0], expected, atol=1e-5)


def test_autoaugment_all_policies_run():
    from PIL import Image

    img = Image.fromarray(
        np.random.default_rng(1).integers(0, 255, (64, 64, 3),
                                          dtype=np.uint8))
    for seed in range(50):   # cover all 25 sub-policies with both branches
        out = transforms.autoaugment(img, random.Random(seed))
        assert out.size == img.size


def test_expert_augment_modes():
    rng = random.Random(3)
    x = np.ones((1, 2048), np.float32)
    outs = [transforms.expert_augment(x, random.Random(s))
            for s in range(40)]
    assert any(np.all(o == 0) for o in outs)          # modality dropout fired
    assert any((o != 0).all() and not np.allclose(o, x)
               for o in outs)                          # noise fired


def test_pad_to_width():
    x = np.ones((2, 512), np.float32)
    p = transforms.pad_to_width(x, 2048)
    assert p.shape == (2, 2048) and p[:, 512:].sum() == 0


def test_grain_adapter_shards_and_batches():
    from devt_tpu.data import grain_adapter

    if not grain_adapter.available():
        import pytest

        pytest.skip("grain not installed")
    seen = []
    for rank in range(2):
        loader = grain_adapter.make_grain_loader(
            _Range(16), 4, shuffle=True, seed=3, process_index=rank,
            process_count=2)
        idxs = [int(i) for b in loader for i in b["idx"]]
        assert len(idxs) == 8
        seen.append(set(idxs))
    assert not (seen[0] & seen[1])          # disjoint host shards
    assert len(seen[0] | seen[1]) == 16     # full coverage


def test_device_prefetch_threaded():
    """Placement runs off-thread: order preserved, exceptions forwarded,
    early abandonment doesn't deadlock the worker."""
    import time

    from devt_tpu.data.pipeline import device_prefetch

    batches = [{"x": np.full((2,), i)} for i in range(6)]
    out = list(device_prefetch(iter(batches), depth=2))
    assert [int(b["x"][0]) for b in out] == list(range(6))

    def boom():
        yield {"x": np.zeros(2)}
        raise RuntimeError("loader died")

    it = device_prefetch(boom(), depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="loader died"):
        next(it)

    # abandoning the generator must release the worker — including the
    # final stop-sentinel put on a full queue (regression: a plain
    # blocking q.put(stop) leaked the thread + device batches)
    import threading
    for n_batches in (2, 6):      # exhausted-iterator and mid-epoch cases
        before = threading.active_count()
        gen = device_prefetch(iter(batches[:n_batches]), depth=1)
        next(gen)
        gen.close()
        deadline = time.time() + 3.0
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before


def test_random_erasing_torchvision_default_and_u8_twin():
    """The reference's RandomErasing is the torchvision DEFAULT: erase to
    value=0 in normalized space (MMX_Frame_dl.py:87).  The u8 wire twin
    fills round(mean*255), which on-device normalization maps to ~0."""
    import random as _random

    import jax.numpy as jnp

    from devt_tpu.data import transforms as T
    from devt_tpu.data.device_norm import dequantize

    base = np.ones((112, 112, 3), np.float32) * 1.7

    out = T.random_erasing(base, _random.Random(0), p=1.0)
    erased = out == 0.0
    assert erased.any() and not erased.all()
    assert np.array_equal(out[~erased], base[~erased])

    rnd = T.random_erasing(base, _random.Random(0), p=1.0, value="random")
    assert not np.array_equal(rnd, out)
    # same seeded rng → same box geometry across variants
    assert np.array_equal(rnd != base, ~np.isclose(out, base))

    u8 = np.full((112, 112, 3), 200, np.uint8)
    out8 = T.random_erasing_u8(u8, _random.Random(0), p=1.0)
    fill = np.round(T.KINETICS_MEAN * 255.0).astype(np.uint8)
    box = (out8 != 200).any(axis=-1)
    assert box.any()
    assert np.array_equal(out8[box], np.broadcast_to(fill, out8[box].shape))
    # identical geometry to the f32 path under the same rng
    assert np.array_equal(box, erased.all(axis=-1))
    # normalized erased region is ~0 (u8 quantization only)
    dq = np.asarray(dequantize(jnp.asarray(out8[None]), T.KINETICS_MEAN,
                               T.KINETICS_STD, dtype=jnp.float32))[0]
    assert np.abs(dq[box]).max() < 0.01


def test_u8_wire_padding_matches_f32_normalized_zeros():
    """Empty slots and failed decodes on the u8 wire must land at ~0 in
    normalized space after device norm — matching the f32 wire's
    zero-fill — not at -mean/std (ADVICE r2: wire formats used to give
    padded samples different model inputs)."""
    import pytest

    import jax.numpy as jnp

    from devt_tpu import native
    from devt_tpu.data import transforms as T
    from devt_tpu.data.device_norm import dequantize
    from devt_tpu.data.mmx_frame import _FrameClipPacker

    if not native.available():
        pytest.skip("native library not built")
    cfg = Config(model="vid", batch_size=1, seq_len=2, frame_len=3,
                 wire_format="u8")
    packer = _FrameClipPacker(cfg, "val")
    assert packer.vid_u8
    _, vid = packer.empty()
    assert vid.dtype == np.uint8
    # buffer is mean-filled, not zero-filled
    assert np.all(vid[0, 0, 0, 0] == np.round(T.KINETICS_MEAN * 255))
    normed = np.asarray(dequantize(
        jnp.asarray(vid[0, 0]), T.KINETICS_MEAN, T.KINETICS_STD,
        dtype=jnp.float32))
    assert np.all(np.abs(normed) < 0.01)

    # failed decodes inside pack_scene get the same mean fill
    import random as _random
    img, vid = packer.empty()
    vid[:] = 0
    packer.pack_scene(img, vid, 0, ["/nonexistent/frame.png"] * 3,
                      _random.Random(0), cycle=False)
    assert np.all(vid[0, 0, 0, 0] == np.round(T.KINETICS_MEAN * 255))


def test_vivit_whole_clip_loader_wires(tmp_path):
    """model="vivit" switches the frame datasets to whole-clip samples:
    one frame_len×224² clip per trailer drawn across its scenes.  The
    three wire formats agree — at val the sampling is deterministic, so
    the u8 token wire is exactly ``patchify`` of the u8 pixel wire and
    the f32 wire is the normalized pixels."""
    from devt_tpu import native
    from devt_tpu.data.mmx_frame import MMXLightDataset

    if not native.available():
        pytest.skip("native library not built")
    import jax.numpy as jnp

    from devt_tpu.data import manifests
    from devt_tpu.models.vivit import patchify

    csv_path = synthetic.write_fake_light_csv(str(tmp_path), n_movies=2,
                                              scenes_per_movie=2,
                                              frames_per_scene=4, size=96)
    df, _ = manifests.load_csv_manifest(csv_path, shuffle_seed=0,
                                        train_rows=2, val_rows=0)

    def sample(wire):
        cfg = Config(model="vivit", frame_len=4, n_classes=19,
                     wire_format=wire)
        return MMXLightDataset(df, cfg, "val")[0]

    pix = sample("u8")
    assert pix["vid"].dtype == np.uint8
    assert pix["vid"].shape == (4, 224, 224, 3)
    tok = sample("u8_tokens")
    assert tok["vid_tokens"].dtype == np.uint8
    assert tok["vid_tokens"].shape == (4, 196, 768)
    np.testing.assert_array_equal(
        tok["vid_tokens"],
        np.asarray(patchify(jnp.asarray(pix["vid"][None]), 16))[0])
    f32 = sample("f32")
    np.testing.assert_allclose(
        f32["vid"],
        (pix["vid"].astype(np.float32) / 255.0 - transforms.KINETICS_MEAN)
        / transforms.KINETICS_STD, atol=1e-5)
    np.testing.assert_array_equal(pix["label"], tok["label"])

    # train sampling is a contiguous window; empty corpora mean-fill
    cfg = Config(model="vivit", frame_len=4, n_classes=19,
                 wire_format="u8_tokens")
    train = MMXLightDataset(df, cfg, "train")[0]
    assert train["vid_tokens"].shape == (4, 196, 768)
    from devt_tpu.data.mmx_frame import _WholeClipPacker
    packer = _WholeClipPacker(cfg, "val")
    empty = packer.sample([], np.zeros(19, np.float32), random.Random(0))
    dq = (empty["vid_tokens"][0, 0].reshape(256, 3).astype(np.float32)
          / 255.0 - transforms.KINETICS_MEAN) / transforms.KINETICS_STD
    assert np.abs(dq).max() < 0.01     # ≈0 in normalized space


def test_random_erasing_clip_vectorized_variants():
    """Clip-level vectorized erasing matches the per-frame functions
    distributionally: ≈p of frames erased, erased pixels at the exact
    fill value, untouched pixels preserved, in-place operation."""
    import random as _random

    from devt_tpu.data import transforms as T

    f = 400
    clip = np.full((f, 64, 64, 3), 200, np.uint8)
    out = T.random_erasing_clip_u8(clip, _random.Random(0))
    assert out is clip                                  # in place
    fill = np.round(T.KINETICS_MEAN * 255.0).astype(np.uint8)
    changed = (clip != 200).any(axis=-1)                # (f, h, w)
    frac = changed.any(axis=(1, 2)).mean()
    assert 0.4 < frac < 0.6                             # p = 0.5
    for i in np.nonzero(changed.any(axis=(1, 2)))[0][:8]:
        box = changed[i]
        # erased region is a filled rectangle at the u8 fill value
        rows, cols = np.nonzero(box)
        assert box[rows.min():rows.max() + 1,
                   cols.min():cols.max() + 1].all()
        np.testing.assert_array_equal(
            clip[i][box], np.broadcast_to(fill, clip[i][box].shape))
        # area within the torchvision scale bounds (rounding slack)
        assert 0.015 * 64 * 64 <= box.sum() <= 0.35 * 64 * 64

    fclip = np.ones((f, 64, 64, 3), np.float32)
    T.random_erasing_clip(fclip, _random.Random(1))
    zeroed = (fclip == 0.0).all(axis=-1)
    assert 0.4 < zeroed.any(axis=(1, 2)).mean() < 0.6
    assert np.all(fclip[~zeroed] == 1.0)


def test_loader_fill_into_matches_generic_collate():
    """The fill-into fast path (item_spec + getitem_into writes each
    sample straight into its batch slot) yields byte-identical batches
    to the generic __getitem__ + collate path, in both worker modes."""
    from devt_tpu.data.pipeline import Loader

    rng = np.random.default_rng(0)
    data = rng.integers(0, 255, (10, 3, 5), np.uint8)
    labels = rng.standard_normal((10, 4)).astype(np.float32)

    class Generic:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": data[i], "label": labels[i]}

    class Fill(Generic):
        item_spec = {"x": ((3, 5), np.uint8), "label": ((4,), np.float32)}

        def getitem_into(self, i, out):
            np.copyto(out["x"], data[i])
            np.copyto(out["label"], labels[i])

    for workers in (1, 2):
        a = list(Loader(Generic(), 4, shuffle=True, seed=3,
                        num_workers=workers, process_index=0,
                        process_count=1))
        b = list(Loader(Fill(), 4, shuffle=True, seed=3,
                        num_workers=workers, process_index=0,
                        process_count=1))
        assert len(a) == len(b) == 2
        for ba, bb in zip(a, b):
            np.testing.assert_array_equal(ba["x"], bb["x"])
            np.testing.assert_array_equal(ba["label"], bb["label"])
            assert bb["x"].dtype == np.uint8


def test_frame_dataset_fill_into_matches_getitem(tmp_path):
    """The real frame dataset's fill-into path (samples pack straight
    into the batch slot) is byte-identical to __getitem__ + collate at
    val (deterministic sampling), for both wire formats."""
    from devt_tpu import native
    from devt_tpu.data import manifests
    from devt_tpu.data.mmx_frame import MMXLightDataset
    from devt_tpu.data.pipeline import Loader

    if not native.available():
        pytest.skip("native library not built")
    csv_path = synthetic.write_fake_light_csv(str(tmp_path), n_movies=4,
                                              scenes_per_movie=2,
                                              frames_per_scene=3, size=96)
    df, _ = manifests.load_csv_manifest(csv_path, shuffle_seed=0,
                                        train_rows=4, val_rows=0)
    for model, wire in (("vid", "u8"), ("vid", "f32"), ("vivit", "u8"),
                        ("vivit", "f32"), ("vivit", "u8_tokens")):
        cfg = Config(model=model, batch_size=2, seq_len=2, frame_len=3,
                     n_classes=19, wire_format=wire)
        ds = MMXLightDataset(df, cfg, "val")
        key = "vid_tokens" if wire == "u8_tokens" else "vid"
        assert ds.item_spec is not None and key in ds.item_spec
        fast = list(Loader(ds, 2, num_workers=1, process_index=0,
                           process_count=1))

        class NoFill:
            """Same dataset through the generic path."""
            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                return ds[i]

        slow = list(Loader(NoFill(), 2, num_workers=1, process_index=0,
                           process_count=1))
        assert len(fast) == len(slow) == 2
        for a, b in zip(fast, slow):
            np.testing.assert_array_equal(a[key], b[key])
            np.testing.assert_array_equal(a["label"], b["label"])
