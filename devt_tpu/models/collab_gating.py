"""Collaborative gating — pairwise expert attention fusion.

Capability twin of ``CollaborativeGating`` (src/models/collabgating.py:2-87),
**vectorised**: the reference iterates a triple-nested Python loop over
batch / scenes / experts (collabgating.py:17-56); here the whole batch is
one fused computation (SURVEY.md §7 step 6 calls this out explicitly).

Per scene with expert projections p_i = P(e_i):
  t_i      = Σ_{j≠i} (p_i + p_j) = (E-2)·p_i + Σ_j p_j    (collabgating.py:31-41)
  a_i      = P(t_i)                                        (attention vector)
  gated_i  = GLU([p_i ; p_i + a_i]) = p_i · σ(p_i + a_i)   (ContextGating,
                                                            collabgating.py:80-87)
  out      = L2-normalise(W_geu · Σ_i gated_i)             (GatedEmbeddingUnit,
                                                            collabgating.py:59-70)

Experts narrower than 2048 are nearest-neighbour resized to 2048, matching
torch ``F.interpolate``'s default mode (collabgating.py:11-15).

Deviation (documented): the reference's pop/append list dance re-projects
already-projected experts when comparing later experts against earlier ones
(collabgating.py:25-46 — expert k>0 sees P(P(e_j)) for j<k).  The evident
intent — each expert projected exactly once — is implemented.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def interpolate_nearest_1d(x, out_size: int):
    """torch ``F.interpolate(mode='nearest')`` on the last axis."""
    n = x.shape[-1]
    if n == out_size:
        return x
    idx = (jnp.arange(out_size) * n) // out_size
    return jnp.take(x, idx, axis=-1)


class CollaborativeGating(nn.Module):
    proj_dim: int = 2048
    output_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, experts):
        """experts: (B, S, E, D≤proj_dim) → (B, S, output_dim)."""
        experts = interpolate_nearest_1d(experts.astype(self.dtype),
                                         self.proj_dim)
        projection = nn.Dense(self.proj_dim, dtype=self.dtype,
                              name="projection")

        p = projection(experts)                       # (B, S, E, D)
        e = p.shape[-2]
        total = jnp.sum(p, axis=-2, keepdims=True)    # Σ_j p_j
        t = (e - 2) * p + total                       # (B, S, E, D)
        a = projection(t)                             # attention vectors
        gated = p * nn.sigmoid(p + a)                 # ContextGating GLU
        fused = jnp.sum(gated, axis=-2)               # (B, S, D)

        out = nn.Dense(self.output_dim, dtype=self.dtype, name="geu_fc")(fused)
        return out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
