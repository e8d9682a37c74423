"""Torch-semantics parity for the TPN reasoning module and collaborative
gating math (clean-room torch reproductions of the reference equations)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from devt_tpu.models.collab_gating import (CollaborativeGating,
                                           interpolate_nearest_1d)
from devt_tpu.models.tpn import sum_group


def test_sum_group_matches_reference_loop():
    """sum_group: sum each g adjacent frames, concat — the reference's
    Python loop (src/models/TPN.py:64-72) vs our reshape+sum."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 20, 8)).astype(np.float32)

    for groups in (2, 3, 4):
        tx = torch.tensor(x)
        concatenation = []
        for group_num in range(int(20 / groups)):
            seg = tx[:, groups * group_num: groups * (group_num + 1), :]
            concatenation.append(torch.sum(seg, dim=1))
        expected = torch.cat(concatenation, dim=1).numpy()
        got = np.asarray(sum_group(jnp.asarray(x), groups))
        np.testing.assert_allclose(got, expected, atol=1e-6)


def test_interpolate_nearest_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 700)).astype(np.float32)
    expected = torch.nn.functional.interpolate(
        torch.tensor(x).unsqueeze(0), 2048).squeeze(0).numpy()
    got = np.asarray(interpolate_nearest_1d(jnp.asarray(x), 2048))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_collab_gating_matches_reference_equations():
    """Vectorised gating vs a direct torch transcription of the intended
    per-expert equations (src/models/collabgating.py:17-56 without the
    pop/append double-projection quirk — see module docstring)."""
    rng = np.random.default_rng(2)
    dim, out_dim, e = 16, 8, 4
    experts = rng.standard_normal((1, 1, e, dim)).astype(np.float32)

    model = CollaborativeGating(proj_dim=dim, output_dim=out_dim)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(experts))
    params = variables["params"]
    W_p = np.asarray(params["projection"]["kernel"])
    b_p = np.asarray(params["projection"]["bias"])
    W_g = np.asarray(params["geu_fc"]["kernel"])
    b_g = np.asarray(params["geu_fc"]["bias"])

    # torch reproduction of the intended math
    tx = torch.tensor(experts[0, 0])                      # (E, dim)
    proj = tx @ torch.tensor(W_p) + torch.tensor(b_p)     # p_i
    gated_sum = torch.zeros(dim)
    for i in range(e):
        t_i = sum(proj[i] + proj[j] for j in range(e) if j != i)
        attn = t_i @ torch.tensor(W_p) + torch.tensor(b_p)
        # ContextGating GLU: cat(x, x + attn) → glu = x * sigmoid(x + attn)
        cat = torch.cat([proj[i], proj[i] + attn])
        gated_sum = gated_sum + torch.nn.functional.glu(cat, dim=-1)
    fused = gated_sum @ torch.tensor(W_g) + torch.tensor(b_g)
    expected = torch.nn.functional.normalize(fused, dim=-1).numpy()

    got = np.asarray(model.apply(variables, jnp.asarray(experts)))[0, 0]
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-4)
