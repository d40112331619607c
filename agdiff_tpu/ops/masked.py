"""Masked reductions and batch-norm statistics for padded batches.

The hard parity point (SURVEY.md section 7.3 item 1): the reference's
BatchNorm1d layers (CFConv, schnet.py:119/122; GINEncoder, gin.py:108-110)
normalize over the *concatenated real nodes* of a variadic PyG batch. In the
padded representation the same statistics must be computed over masked
entries only, across the whole (B, N) node block.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def masked_mean(
    x: jax.Array, mask: jax.Array, axis=None, keepdims: bool = False
) -> jax.Array:
    """Mean of x over entries where mask is True."""
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    total = jnp.sum(x * m, axis=axis, keepdims=keepdims)
    count = jnp.maximum(jnp.sum(m, axis=axis, keepdims=keepdims), 1.0)
    return total / count


def masked_batch_norm_stats(
    x: jax.Array, mask: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-channel mean and (biased) variance over real nodes.

    Args:
      x: (B, N, C); mask: (B, N) bool.
    Returns:
      (mean (C,), var (C,), count ()) — biased variance, as torch BatchNorm
      uses for normalization (it uses unbiased only for the running update).
    """
    m = mask[..., None].astype(x.dtype)
    count = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(x * m, axis=(0, 1)) / count
    var = jnp.sum(((x - mean) ** 2) * m, axis=(0, 1)) / count
    return mean, var, count


def masked_softmax(
    logits: jax.Array, mask: jax.Array, axis: int = -1
) -> jax.Array:
    """Softmax over masked entries (0 where mask is False)."""
    neg = jnp.finfo(logits.dtype).min
    z = jnp.where(mask, logits, neg)
    z = z - jax.lax.stop_gradient(jnp.max(z, axis=axis, keepdims=True))
    e = jnp.exp(z) * mask.astype(logits.dtype)
    return e / jnp.maximum(jnp.sum(e, axis=axis, keepdims=True), 1e-20)


# --------------------------------------------------------------------------
# Graph readouts and coarse-graining (reference: common.py:12-41, 267-313 —
# not used by the diffusion path, provided for API completeness)
# --------------------------------------------------------------------------

def mean_readout(node_attr: jax.Array, node_mask: jax.Array) -> jax.Array:
    """(B, N, C) -> (B, C) mean over real nodes (reference MeanReadout)."""
    return masked_mean(node_attr, node_mask, axis=1)


def sum_readout(node_attr: jax.Array, node_mask: jax.Array) -> jax.Array:
    """(B, N, C) -> (B, C) sum over real nodes (reference SumReadout)."""
    m = node_mask[..., None].astype(node_attr.dtype)
    return jnp.sum(node_attr * m, axis=1)


def coarse_grain(
    pos: jax.Array,          # (B, N, 3)
    node_attr: jax.Array,    # (B, N, C)
    subgraph_onehot: jax.Array,  # (B, N, K) float one-hot cluster assignment
    node_mask: jax.Array,    # (B, N)
):
    """Cluster pooling (reference: common.py:267-276): cluster positions are
    node means, cluster features are node sums. Dense form: the scatter index
    becomes a one-hot assignment matrix (mask-aware)."""
    w = subgraph_onehot * node_mask[..., None].astype(subgraph_onehot.dtype)
    counts = jnp.maximum(jnp.sum(w, axis=1), 1.0)  # (B, K)
    cluster_pos = jnp.einsum("bnk,bnc->bkc", w, pos) / counts[..., None]
    cluster_attr = jnp.einsum("bnk,bnc->bkc", w, node_attr)
    cluster_mask = jnp.sum(w, axis=1) > 0
    return cluster_pos, cluster_attr, cluster_mask


def complete_graph_mask(node_mask: jax.Array) -> jax.Array:
    """(B, N) -> (B, N, N) all-pairs (off-diagonal) edge mask — the dense
    equivalent of get_complete_graph (reference: common.py:283-313)."""
    n = node_mask.shape[-1]
    pair = node_mask[:, :, None] & node_mask[:, None, :]
    return pair & ~jnp.eye(n, dtype=bool)[None]
