"""Configurable MLP with optional per-layer sigmoid attention gates
(reference: src/agdiff/models/common.py:44-103 MultiLayerPerceptron)."""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from agdiff_tpu.nn.common import Linear, activation_by_name


class MultiLayerPerceptron(nn.Module):
    """Dense stack: activation (and optional attention gate / dropout) between
    layers only — never after the last layer (reference: common.py:86-103)."""

    hidden_dims: Sequence[int]
    activation: str = "relu"
    dropout: float = 0.0
    use_attention: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation_by_name(self.activation)
        n_layers = len(self.hidden_dims)
        for i, dim in enumerate(self.hidden_dims):
            x = Linear(dim, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < n_layers - 1:
                if self.use_attention:
                    scores = jax.nn.sigmoid(
                        Linear(dim, dtype=self.dtype, name=f"attention_{i}")(x)
                    )
                    x = x * scores
                if act is not None:
                    x = act(x)
                if self.dropout > 0.0:
                    x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x
