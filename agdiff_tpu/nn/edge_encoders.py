"""Edge encoders: embed (edge_length, edge_type) -> edge feature vectors.

Dense layout: edge_length (B, N, N, 1), edge_type (B, N, N) int -> edge_attr
(B, N, N, H). All pair positions are computed (padded pairs are masked by the
consumer); the inner Linear layers are plain matmuls over B*N*N rows — ideal
MXU work.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from agdiff_tpu.nn.common import Linear


class MLPEdgeEncoder(nn.Module):
    """The edge encoder both reference configs use (`edge_encoder: mlp`,
    reference: src/agdiff/models/encoder/edge.py:45-103).

    Pipeline: GELU(Linear(1->H)) feature expansion of edge length; bond-type
    embedding (100, H); concat -> 2-layer MLP; concat with bond embedding
    again -> 2-layer MLP; attention reweighting.

    attention_mode replicates a reference quirk (edge.py:73-78): the torch
    code ends its attention stack with Softmax(dim=1) applied to an (E, 1)
    tensor — a softmax over a singleton axis, which is identically 1.0, so the
    "attention" multiplies by exactly one. Modes:
      'softmax_dim1' — faithful: compute the singleton softmax (identity).
      'none'         — skip the no-op computation (bit-identical output).
      'sigmoid'      — a functional gate (extension, non-reference).
    """

    hidden_dim: int = 128
    attention_mode: str = "softmax_dim1"
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.hidden_dim

    @nn.compact
    def __call__(self, edge_length, edge_type):
        h = self.hidden_dim
        expanded = jax.nn.gelu(
            Linear(h, dtype=self.dtype, name="feature_expansion")(edge_length)
        )
        bond = nn.Embed(
            100, h, embedding_init=nn.initializers.normal(1.0), name="bond_emb",
            param_dtype=jnp.float32,
        )(edge_type).astype(self.dtype)

        combined = jnp.concatenate([expanded, bond], axis=-1)
        x = Linear(h, dtype=self.dtype, name="edge_feature_mlp_0")(combined)
        x = jax.nn.gelu(x)
        x = Linear(h, dtype=self.dtype, name="edge_feature_mlp_1")(x)

        y = jnp.concatenate([x, bond], axis=-1)
        y = Linear(h, dtype=self.dtype, name="combination_mlp_0")(y)
        y = jax.nn.gelu(y)
        edge_attr = Linear(h, dtype=self.dtype, name="combination_mlp_1")(y)

        if self.attention_mode == "none":
            return edge_attr
        logits = Linear(h, dtype=self.dtype, name="attention_0")(edge_attr)
        logits = jnp.tanh(logits)
        logits = Linear(1, dtype=self.dtype, name="attention_1")(logits)
        if self.attention_mode == "softmax_dim1":
            # softmax over the singleton channel axis == 1.0 exactly
            weights = jax.nn.softmax(logits, axis=-1)
        elif self.attention_mode == "sigmoid":
            weights = jax.nn.sigmoid(logits)
        else:
            raise ValueError(f"Unknown attention_mode: {self.attention_mode}")
        return edge_attr * weights


class GaussianSmearing(nn.Module):
    """Fixed Gaussian RBF expansion (reference: schnet.py:18-27)."""

    start: float = 0.0
    stop: float = 5.0
    num_gaussians: int = 50

    @nn.compact
    def __call__(self, dist):
        offset = jnp.linspace(self.start, self.stop, self.num_gaussians)
        coeff = -0.5 / (offset[1] - offset[0]) ** 2
        diff = dist - offset  # (..., 1) - (G,) -> (..., G)
        return jnp.exp(coeff * diff * diff)


class AsymmetricSineCosineSmearing(nn.Module):
    """Angle basis: sin(k*angle) for k=1..num_basis//2 concatenated with
    cos(l*angle) for l=1..ceil(num_basis/2) — the cosine half distinguishes
    0 from pi (reference: schnet.py:30-52; unused by the shipped model,
    provided for inventory completeness)."""

    num_basis: int = 50

    @property
    def num_basis_out(self) -> int:
        return self.num_basis

    @nn.compact
    def __call__(self, angle):
        k = self.num_basis // 2
        el = self.num_basis - k
        freq_k = jnp.arange(1, k + 1, dtype=angle.dtype)
        freq_l = jnp.arange(1, el + 1, dtype=angle.dtype)
        a = angle[..., None]
        return jnp.concatenate(
            [jnp.sin(a * freq_k), jnp.cos(a * freq_l)], axis=-1
        )


class SymmetricCosineSmearing(nn.Module):
    """cos(k*angle), k=1..num_basis — symmetric under angle -> -angle
    (reference: schnet.py:55-68; unused by the shipped model)."""

    num_basis: int = 50

    @property
    def num_basis_out(self) -> int:
        return self.num_basis

    @nn.compact
    def __call__(self, angle):
        freq_k = jnp.arange(1, self.num_basis + 1, dtype=angle.dtype)
        return jnp.cos(angle[..., None] * freq_k)


class GaussianSmearingEdgeEncoder(nn.Module):
    """RBF smearing + bond embedding (reference: edge.py:17-42 — which is
    broken in the reference: it references an un-imported GaussianSmearing and
    would raise NameError if selected; implemented working here).
    out_channels = 2 * num_gaussians."""

    num_gaussians: int = 64
    cutoff: float = 10.0
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.num_gaussians * 2

    @nn.compact
    def __call__(self, edge_length, edge_type):
        rbf = GaussianSmearing(
            start=0.0, stop=self.cutoff * 2, num_gaussians=self.num_gaussians,
            name="rbf",
        )(edge_length.astype(self.dtype))
        bond = nn.Embed(
            100, self.num_gaussians, embedding_init=nn.initializers.normal(1.0),
            name="bond_emb", param_dtype=jnp.float32,
        )(edge_type).astype(self.dtype)
        return jnp.concatenate([rbf, bond], axis=-1)


def get_edge_encoder(config, dtype=jnp.float32, name=None):
    """Factory keyed on config.edge_encoder (reference: edge.py:106-116)."""
    if config.edge_encoder == "mlp":
        return MLPEdgeEncoder(
            hidden_dim=config.hidden_dim,
            attention_mode=config.edge_attention_mode,
            dtype=dtype,
            name=name,
        )
    if config.edge_encoder == "gaussian":
        return GaussianSmearingEdgeEncoder(
            num_gaussians=config.hidden_dim // 2, cutoff=config.cutoff,
            dtype=dtype, name=name,
        )
    raise ValueError(f"Unknown edge encoder: {config.edge_encoder}")
