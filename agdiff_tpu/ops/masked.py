"""Masked reductions and batch-norm statistics for padded batches.

The hard parity point (SURVEY.md section 7.3 item 1): the reference's
BatchNorm1d layers (CFConv, schnet.py:119/122; GINEncoder, gin.py:108-110)
normalize over the *concatenated real nodes* of a variadic PyG batch. In the
padded representation the same statistics must be computed over masked
entries only, across the whole (B, N) node block.
"""

from __future__ import annotations

from typing import Optional, Tuple

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
