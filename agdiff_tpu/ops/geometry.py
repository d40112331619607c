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
    """Row-wise L2 norm clip (reference: dualenc.py:586-589).

    Differentiable at vec = 0: sqrt(max(sq, EPS^2)) instead of
    jnp.linalg.norm — value-identical for every row the clip can affect
    (norm > limit >> EPS) but with a finite gradient on all-zero rows
    (padded nodes), which the raw norm's 0/0 would turn into NaN. The
    distillation loss differentiates through the assembled drift's clips
    (train/distill.py); the reference never does (clip_norm sits outside
    its autograd path, dualenc.py:505-521)."""
    sq = jnp.sum(vec * vec, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, EPS * EPS))
    denom = jnp.where(norm > limit, limit / norm, 1.0)
    return vec * denom


# --------------------------------------------------------------------------
# Internal-coordinate utilities (reference: geometry.py:39-70; unused by the
# main diffusion path but part of the public geometry API)
# --------------------------------------------------------------------------

def get_angle(pos: jax.Array, angle_index: jax.Array) -> jax.Array:
    """Angles at center atoms. angle_index: (3, A) = (n1, ctr, n2) rows.
    pos: (N, 3). Returns (A, 1) angles in radians."""
    n1, ctr, n2 = angle_index
    v1 = pos[n1] - pos[ctr]
    v2 = pos[n2] - pos[ctr]
    inner = jnp.sum(v1 * v2, axis=-1, keepdims=True)
    length = (
        jnp.linalg.norm(v1, axis=-1, keepdims=True)
        * jnp.linalg.norm(v2, axis=-1, keepdims=True)
    )
    return jnp.arccos(jnp.clip(inner / jnp.maximum(length, EPS), -1.0, 1.0))


def get_dihedral(pos: jax.Array, dihedral_index: jax.Array) -> jax.Array:
    """Dihedral angles. dihedral_index: (4, A) = (n1, ctr1, ctr2, n2).
    Returns (A, 1) in radians (reference: geometry.py:53-70)."""
    n1, ctr1, ctr2, n2 = dihedral_index
    v_ctr = pos[ctr2] - pos[ctr1]
    v1 = pos[n1] - pos[ctr1]
    v2 = pos[n2] - pos[ctr2]
    nrm1 = jnp.cross(v_ctr, v1)
    nrm2 = jnp.cross(v_ctr, v2)
    inner = jnp.sum(nrm1 * nrm2, axis=-1, keepdims=True)
    length = (
        jnp.linalg.norm(nrm1, axis=-1, keepdims=True)
        * jnp.linalg.norm(nrm2, axis=-1, keepdims=True)
    )
    return jnp.arccos(jnp.clip(inner / jnp.maximum(length, EPS), -1.0, 1.0))


def convert_cluster_score_d(
    cluster_score_d: jax.Array,
    cluster_pos: jax.Array,
    cluster_edge_mask: jax.Array,
    cluster_edge_length: jax.Array,
    subgraph_index: jax.Array,
) -> jax.Array:
    """Coarse-grained cluster distance scores -> per-node position scores
    (reference: geometry.py:20-36): eq_transform at cluster level, broadcast
    back to the nodes of each cluster via subgraph_index (N,)."""
    cluster_score_pos = eq_transform_dense(
        cluster_score_d, cluster_pos, cluster_edge_mask, cluster_edge_length
    )
    return jnp.take_along_axis(
        cluster_score_pos, subgraph_index[..., None].astype(jnp.int32), axis=-2
    )
