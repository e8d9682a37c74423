"""Shape/smoke tests for the full model family + loss semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from devt_tpu.config import Config
from devt_tpu.models import losses
from devt_tpu.models.collab_gating import CollaborativeGating
from devt_tpu.models.contrastive import (ContrastiveEncoder,
                                         adaptive_avg_pool_1d,
                                         expert_aggregation)
from devt_tpu.models.ptn import PTN
from devt_tpu.models.vivit import ViViT
from devt_tpu.registry import build_model, example_batch

RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


def test_vivit_forward_shapes():
    """Reference self-test: ViViT(224,16,100,16) on [1,16,3,224,224]
    → [1,100] (src/models/vit.py:133-144)."""
    model = ViViT(224, 16, 100, 16, attention_impl="xla")
    x = jnp.ones((1, 16, 3, 224, 224))
    params = model.init(RNGS, x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (1, 100)
    # parameter count sanity: dim=192/depth=4 twin transformers + pos embed
    # ≈ 4.3M (matches the reference's printed count, vit.py:138-140)
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    assert 3e6 < n_params < 6e6


def test_vivit_tokens_in_matches_pixels_in():
    """The pre-patchified tokens path (native-loader layout) produces the
    same logits as the pixel path through the SAME parameters: patchify →
    dot == conv patch embed.  Token layout is the reference's
    ``(p1 p2 c)`` Rearrange order (vit.py:89-91)."""
    from devt_tpu.models.vivit import patchify

    model = ViViT(image_size=32, patch_size=16, num_classes=7, num_frames=2,
                  dim=32, depth=1, heads=2, dim_head=16, channels_last=True,
                  attention_impl="xla")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 2, 32, 32, 3), dtype=np.float32))
    params = model.init(RNGS, x)["params"]
    out_pix = model.apply({"params": params}, x)
    out_tok = model.apply({"params": params}, patchify(x, 16), tokens_in=True)
    np.testing.assert_allclose(np.asarray(out_tok), np.asarray(out_pix),
                               rtol=1e-5, atol=1e-5)


def test_patchify_matches_reference_rearrange():
    """patchify == einops Rearrange('b t c (h p1) (w p2) -> b t (h w)
    (p1 p2 c)') on channels-first input (vit.py:89-91)."""
    from einops import rearrange

    from devt_tpu.models.vivit import patchify

    rng = np.random.default_rng(1)
    x_cf = rng.standard_normal((2, 3, 3, 8, 8)).astype(np.float32)  # b t c h w
    want = rearrange(torch.from_numpy(x_cf),
                     "b t c (h p1) (w p2) -> b t (h w) (p1 p2 c)",
                     p1=4, p2=4).numpy()
    got = patchify(jnp.asarray(x_cf.transpose(0, 1, 3, 4, 2)), 4)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_ptn_shapes_and_expert_structure():
    model = PTN(input_dimension=128, nhead=4, nhid=128, nlayers=2,
                num_experts=3, seq_len=5, n_classes=15, dropout=0.0,
                attention_impl="xla")
    x = jnp.ones((2, 5, 3, 128))
    params = model.init(RNGS, x)["params"]
    assert {"encoder_0", "encoder_1", "encoder_2"} <= set(params)
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 15)


def test_ptn_shared_uses_single_encoder():
    model = PTN(input_dimension=64, nhead=2, nhid=64, nlayers=1,
                num_experts=2, seq_len=4, n_classes=15, dropout=0.0,
                shared=True, attention_impl="xla")
    x = jnp.ones((2, 4, 2, 64))
    params = model.init(RNGS, x)["params"]
    assert "encoder_shared" in params and "encoder_0" not in params
    assert model.apply({"params": params}, x).shape == (2, 15)


@pytest.mark.parametrize("variant,extra_keys", [
    ("vid", ()),
    ("frame", ()),
    ("distil", ("distil_logits", "teacher_logits")),
    ("sum", ()),
    ("post_sum", ()),
    ("sum_residual", ()),
    ("pre_modal", ()),
])
def test_frame_transformer_variants(variant, extra_keys):
    from devt_tpu.models.frame_transformer import FrameTransformer
    cfg = Config(model=variant, seq_len=3, frame_len=4, n_classes=19,
                 batch_size=2, precision="f32", attention_impl="xla")
    # tiny spatial dims for CPU test speed
    model = FrameTransformer(model=variant, seq_len=3, frame_len=4,
                             n_classes=19, img_size=64, vid_size=32,
                             attention_impl="xla")
    batch = example_batch(cfg)
    img = jnp.asarray(batch["img"][:, :, :64, :64])
    vid = jnp.asarray(batch["vid"][:, :, :, :32, :32])
    variables = model.init(RNGS, img=img, vid=vid, train=False)
    out = model.apply(variables, img=img, vid=vid, train=False)
    assert out["logits"].shape == (2, 19)
    for k in extra_keys:
        assert out[k].shape == (2, 19)
    assert bool(jnp.all(jnp.isfinite(out["logits"])))


def test_tpn_shapes():
    cfg = Config(model="tpn", n_classes=15, precision="f32", batch_size=2)
    model = build_model(cfg)
    x = jnp.ones((2, 20, 64, 64, 3))
    variables = model.init(RNGS, x)
    out = model.apply(variables, x)
    assert out.shape == (2, 15)
    # sigmoid-averaged predictions live in [0, 1] (TPN.py:98,112)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_lstm_and_basicmlp_shapes():
    for name in ("lstm", "basicmlp"):
        cfg = Config(model=name, precision="f32", batch_size=2)
        model = build_model(cfg)
        batch = example_batch(cfg)
        x = jnp.asarray(batch["experts"])
        variables = model.init(RNGS, x)
        out = model.apply(variables, x)
        assert out.shape[0] == 2


def test_contrastive_encoder_and_losses():
    model = ContrastiveEncoder(input_shape=64, hidden_layer=32,
                               projection_size=16, output_shape=8)
    x = jnp.ones((4, 64))
    variables = model.init(RNGS, x, train=False)
    emb, proj = model.apply(variables, x, train=False)
    assert emb.shape == (4, 16) and proj.shape == (4, 8)


def test_contrastive_loss_matches_torch_reference_semantics():
    """Reproduce the reference ContrastiveLoss computation in torch
    (src/models/losses/ntxent.py:44-75) and compare."""
    rng = np.random.default_rng(0)
    n, d = 6, 16
    zi, zj = rng.standard_normal((n, d)), rng.standard_normal((n, d))

    t_zi, t_zj = torch.tensor(zi), torch.tensor(zj)
    reps = torch.cat([t_zi, t_zj], dim=0)
    sim = tF.cosine_similarity(reps.unsqueeze(1), reps.unsqueeze(0), dim=2)
    pos = torch.cat([torch.diag(sim, n), torch.diag(sim, -n)])
    nom = torch.exp(pos / 0.5)
    mask = (~torch.eye(2 * n, dtype=bool)).float()
    den = mask * torch.exp(sim / 0.5)
    expected = float(torch.sum(-torch.log(nom / torch.sum(den, dim=1)))
                     / (2 * n))

    got = float(losses.contrastive_loss(jnp.asarray(zi), jnp.asarray(zj),
                                        temperature=0.5))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_nt_xent_matches_torch_reference_semantics():
    """Reproduce NT_Xent's intended value in torch (ntxent.py:5-41 with the
    missing ``return loss`` fixed) and compare."""
    rng = np.random.default_rng(1)
    n, d = 5, 12
    zi, zj = rng.standard_normal((n, d)), rng.standard_normal((n, d))

    t_zi, t_zj = torch.tensor(zi), torch.tensor(zj)
    big_n = 2 * n
    z = torch.cat([t_zi, t_zj], dim=0)
    sim = tF.cosine_similarity(z.unsqueeze(1), z.unsqueeze(0), dim=2) / 0.5
    sim_ij = torch.diag(sim, n)
    sim_ji = torch.diag(sim, -n)
    positives = torch.cat([sim_ij, sim_ji]).reshape(big_n, 1)
    mask = torch.ones((big_n, big_n), dtype=bool).fill_diagonal_(0)
    for i in range(n):
        mask[i, n + i] = 0
        mask[n + i, i] = 0
    negatives = sim[mask].reshape(big_n, -1)
    logits = torch.cat([positives, negatives], dim=1)
    labels = torch.zeros(big_n).long()
    expected = float(tF.cross_entropy(logits, labels, reduction="sum") / big_n)

    got = float(losses.nt_xent(jnp.asarray(zi), jnp.asarray(zj),
                               temperature=0.5))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_bce_with_logits_matches_torch():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((4, 15))
    targets = (rng.random((4, 15)) < 0.3).astype(np.float32)
    expected = float(tF.binary_cross_entropy_with_logits(
        torch.tensor(logits).float(), torch.tensor(targets)))
    got = float(losses.bce_with_logits(jnp.asarray(logits),
                                       jnp.asarray(targets)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((6, 10))
    labels = rng.integers(0, 10, (6,))
    expected = float(tF.cross_entropy(torch.tensor(logits).float(),
                                      torch.tensor(labels)))
    got = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_adaptive_avg_pool_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, 100))
    expected = tF.adaptive_avg_pool1d(torch.tensor(x)[:, None, :], 32)[:, 0]
    got = adaptive_avg_pool_1d(jnp.asarray(x), 32)
    # ours runs in f32 (cumsum-based); torch in f64
    np.testing.assert_allclose(got, expected.numpy(), atol=1e-5)


def test_collab_gating_shapes_and_norm():
    model = CollaborativeGating(proj_dim=64, output_dim=32)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((2, 3, 4, 48)))
    variables = model.init(RNGS, x)
    out = model.apply(variables, x)
    assert out.shape == (2, 3, 32)
    norms = jnp.linalg.norm(out, axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_expert_aggregation_modes():
    e1 = jnp.ones((2, 10))
    e2 = 2 * jnp.ones((2, 6))
    assert expert_aggregation([e1, e2], "none", 8).shape == (2, 10)
    assert expert_aggregation([e1, e2], "concat", 8).shape == (2, 16)
    assert expert_aggregation([e1, e2], "avg_pool", 8).shape == (2, 8)
    assert expert_aggregation([e1, e2], "mean_pool", 8).shape == (2, 8)
