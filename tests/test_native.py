"""Native host library: decode/preprocess parity vs PIL path + ANN index."""

import os

import numpy as np
import pytest
from PIL import Image

from devt_tpu import native
from devt_tpu.data import transforms

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (size, fmt) in enumerate([((80, 120), "JPEG"), ((64, 64), "PNG"),
                                     ((150, 90), "JPEG")]):
        arr = rng.integers(0, 255, (size[0], size[1], 3), dtype=np.uint8)
        p = os.path.join(root, f"img{i}.{fmt.lower()}")
        Image.fromarray(arr).save(p, fmt)
        paths.append(p)
    return paths


def test_fused_load_close_to_pil_path(image_files):
    mean, std = transforms.IMAGENET_MEAN, transforms.IMAGENET_STD
    for p in image_files:
        got = native.load_image_f32(p, 230, 56, mean, std)
        assert got is not None and got.shape == (56, 56, 3)
        ref = transforms.val_image_transform(Image.open(p).convert("RGB"),
                                             size=56, resize=230)
        # PIL and the native resampler use slightly different bilinear
        # weighting; require close agreement in normalized units
        assert np.mean(np.abs(got - ref)) < 0.12
        assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.98


def test_batch_load_threads_and_fault_tolerance(image_files):
    mean, std = transforms.KINETICS_MEAN, transforms.KINETICS_STD
    paths = image_files + ["/nonexistent/file.jpg"]
    out, status = native.load_batch_f32(paths, 120, 112, mean, std,
                                        nthreads=4)
    assert out.shape == (4, 112, 112, 3)
    assert status[:3].tolist() == [0, 0, 0]
    assert status[3] != 0
    assert np.all(out[3] == 0)          # failed decode leaves zeros
    assert np.isfinite(out).all()


def test_u8_wire_matches_f32_path(image_files):
    """u8 wire format: device-side (v/255 - mean)/std over the u8 batch
    must reproduce the host f32 batch exactly (the native resize rounds
    to uint8 in both paths, so only the normalize moves)."""
    mean, std = transforms.KINETICS_MEAN, transforms.KINETICS_STD
    paths = image_files + ["/nonexistent/file.jpg"]
    f32, st_f = native.load_batch_f32(paths, 120, 112, mean, std)
    u8, st_u = native.load_batch_u8(paths, 120, 112)
    assert u8.dtype == np.uint8 and u8.shape == (4, 112, 112, 3)
    assert st_u.tolist() == st_f.tolist()
    assert np.all(u8[3] == 0)           # fault tolerance: zeros on failure

    import jax.numpy as jnp

    from devt_tpu.data.device_norm import dequantize

    got = np.asarray(dequantize(jnp.asarray(u8), mean, std,
                                dtype=jnp.float32))
    np.testing.assert_allclose(got[:3], f32[:3], atol=1e-5)


def test_u8_patches_wire_matches_device_patchify(image_files):
    """The pre-patchified u8 wire is a pure byte permutation: tokens ==
    patchify(pixels) bit-exactly, failed decodes zero-fill with nonzero
    status, and device_norm's per-lane constants reproduce the pixel-wire
    normalization."""
    import jax.numpy as jnp

    from devt_tpu.data.device_norm import maybe_dequantize_batch
    from devt_tpu.models.vivit import patchify

    paths = image_files + ["/nonexistent/file.jpg"]
    pix, st_p = native.load_batch_u8(paths, 120, 112)
    tok, st_t = native.load_batch_u8_patches(paths, 120, 112, patch=16)
    assert tok.dtype == np.uint8 and tok.shape == (4, 49, 768)
    assert st_t.tolist() == st_p.tolist()
    want = np.asarray(patchify(jnp.asarray(pix[None]), 16))[0]
    np.testing.assert_array_equal(tok, want)
    assert np.all(tok[3] == 0)

    # per-lane device norm == per-channel norm of the same bytes
    mean, std = transforms.KINETICS_MEAN, transforms.KINETICS_STD
    out = maybe_dequantize_batch(
        {"vid_tokens": jnp.asarray(tok[None])}, dtype=jnp.float32)
    ref = (pix[None].astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(np.asarray(out["vid_tokens"]),
                               np.asarray(patchify(jnp.asarray(ref), 16)),
                               atol=1e-5)


def test_maybe_dequantize_batch_keys():
    import jax.numpy as jnp

    from devt_tpu.data.device_norm import maybe_dequantize_batch

    vid = jnp.full((2, 3, 4, 4, 3), 128, jnp.uint8)
    batch = {"vid": vid, "label": jnp.zeros((2, 19))}
    out = maybe_dequantize_batch(batch, dtype=jnp.float32)
    assert out["vid"].dtype == jnp.float32
    ref = (128 / 255.0 - transforms.KINETICS_MEAN) / transforms.KINETICS_STD
    np.testing.assert_allclose(np.asarray(out["vid"][0, 0, 0, 0]), ref,
                               atol=1e-5)
    assert out["label"] is batch["label"]      # non-pixel leaves untouched


def test_ann_index_exact_knn(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.standard_normal((200, 15)).astype(np.float32)
    idx = native.AnnIndex(15)
    for i, v in enumerate(data):
        idx.add_item(i, v)
    idx.build(750)
    assert len(idx) == 200

    q = data[17] + 0.01 * rng.standard_normal(15).astype(np.float32)
    ids, dists = idx.get_nns_by_vector(q, 10, include_distances=True)
    # exact search must rank item 17 first and distances ascending
    true_order = np.argsort(np.linalg.norm(data - q, axis=1))[:10]
    assert ids == true_order.tolist()
    assert ids[0] == 17
    assert all(dists[i] <= dists[i + 1] for i in range(9))

    path = str(tmp_path / "test.ann")
    idx.save(path)
    loaded = native.AnnIndex.load(15, path)
    assert loaded.get_nns_by_vector(q, 3) == ids[:3]


def test_native_video_decode_mjpeg_avi(tmp_path):
    """First-party MJPG-in-AVI decode (the ffmpeg role, spatio_cut.py:11-33):
    probe, rgb8 decode, fused f32 decode."""
    from devt_tpu.data.synthetic import write_fake_mjpeg_avi

    path = str(tmp_path / "clip.avi")
    write_fake_mjpeg_avi(path, n_shots=3, frames_per_shot=16, size=96)

    info = native.video_info(path)
    assert info == (48, 96, 96)

    frames = native.load_video_rgb8(path)
    assert frames.shape == (48, 96, 96, 3) and frames.dtype == np.uint8
    # shots are visually distinct: mean jumps at shot boundaries
    means = frames.reshape(48, -1).mean(1)
    assert abs(means[16] - means[15]) > 3 or abs(means[32] - means[31]) > 3

    f32 = native.load_video_f32(path, 96, 64, [0.0, 0.0, 0.0],
                                [1.0, 1.0, 1.0], max_frames=8)
    assert f32.shape == (8, 64, 64, 3)
    assert 0.0 <= f32.mean() <= 1.0


def test_spatio_cut_native_video_file(tmp_path):
    """cut_video_file on an AVI: the reference test contract — 3 chunks x
    16 frames (src/tests/test_transforms.py:13-21) — without ffmpeg."""
    from devt_tpu.data.synthetic import write_fake_mjpeg_avi
    from devt_tpu.data_processing.spatio_cut import SpatioCut

    path = str(tmp_path / "clip.avi")
    write_fake_mjpeg_avi(path, n_shots=3, frames_per_shot=16, size=96)
    cutter = SpatioCut()
    chunks = cutter.cut_video_file(path, frames_per_chunk=16)
    assert len(chunks) == 3
    assert all(len(c) == 16 for c in chunks)
    assert chunks[0][0].shape == (96, 96, 3)

    # shot-aware path restarts chunks at boundaries
    chunks_sa = cutter.cut_video_file(path, frames_per_chunk=16,
                                      shot_aware=True)
    assert len(chunks_sa) == 3
