"""Dense masked geometry ops (jit-safe, static shapes).

These are the TPU-native equivalents of the reference's torch-scatter-based
edge-list ops (reference: src/agdiff/models/geometry.py, epsnet/dualenc.py:581-589).
Everything operates on (B, N, ...) padded blocks with boolean masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-12


def pairwise_distance(pos: jax.Array) -> jax.Array:
    """(B, N, 3) -> (B, N, N) Euclidean distances.

    Equivalent to get_distance over a dense edge set (reference:
    geometry.py:5-6). Diagonal / padded entries are whatever the raw math
    gives (0 on the diagonal) — callers must mask.
    """
    diff = pos[:, :, None, :] - pos[:, None, :, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1) + EPS)


def eq_transform_dense(
    score_d: jax.Array,     # (B, N, N) per-directed-pair distance scores
    pos: jax.Array,         # (B, N, 3)
    edge_mask: jax.Array,   # (B, N, N) bool
    edge_length: jax.Array,  # (B, N, N)
) -> jax.Array:
    """Chain-rule transform: distance scores -> SE(3)-equivariant position
    scores (reference: geometry.py:9-17).

    For directed edge (i, j): dd/dr_i = (r_i - r_j)/d. The reference
    scatter-adds +dd_dr * s to the source and -dd_dr * s to the target. In
    dense form, node i accumulates from edge (i, j) as source and from edge
    (j, i) as target:

      out_i = sum_j [ m_ij * s_ij + m_ji * s_ji ] * (r_i - r_j) / d_ij

    (d is symmetric). Returns (B, N, 3).
    """
    s = jnp.where(edge_mask, score_d, 0.0)
    w = s + jnp.swapaxes(s, 1, 2)  # (B, N, N) combined source+target weights
    inv_d = w / jnp.maximum(edge_length, EPS)
    diff = pos[:, :, None, :] - pos[:, None, :, :]  # (B, N, N, 3)
    return jnp.einsum("bij,bijc->bic", inv_d, diff)


def center_pos(pos: jax.Array, node_mask: jax.Array) -> jax.Array:
    """Zero the center of mass per graph over real nodes (reference:
    dualenc.py:581-583 via scatter_mean)."""
    m = node_mask[..., None].astype(pos.dtype)
    count = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    com = jnp.sum(pos * m, axis=1, keepdims=True) / count
    return (pos - com) * m


def clip_norm(vec: jax.Array, limit: float) -> jax.Array:
    """Row-wise L2 norm clip (reference: dualenc.py:586-589)."""
    norm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    denom = jnp.where(norm > limit, limit / jnp.maximum(norm, EPS), 1.0)
    return vec * denom
