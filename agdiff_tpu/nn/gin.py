"""Local GIN encoder over the bond (local) graph, dense masked form.

Reference: src/agdiff/models/encoder/gin.py. The local graph is the
order-extended bond graph (edge_type > 0); in the dense representation it is
just the `local_mask` slice of the working graph, so no edge-list slicing
(reference dualenc.py:220-224 edge_index[:, local_edge_mask]) is needed.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from agdiff_tpu.nn.common import MaskedBatchNorm, activation_by_name
from agdiff_tpu.nn.mlp import MultiLayerPerceptron


class GINEConv(nn.Module):
    """GIN-epsilon convolution with edge features (reference: gin.py:14-72).

    message(i<-j) = act(x_j + edge_attr_ij); out_i = nn((1 + eps) * x_i +
    sum_j mask_ij * message_ij). eps is 0 and non-trainable by default, as in
    the reference construction (gin.py:101-106)."""

    hidden_dim: int
    activation: str = "relu"
    eps: float = 0.0
    train_eps: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, local_mask, edge_attr, train: bool, pairs=None):
        act = activation_by_name(self.activation)
        if self.train_eps:
            eps = self.param("eps", lambda k: jnp.array(self.eps, jnp.float32))
        else:
            eps = self.eps
        if pairs is not None:
            # packed layout: edge_attr (B, P, H), local_mask (B, P); the
            # message into i is act(x_j + e_p) and vice versa
            from agdiff_tpu.ops.pairs import (
                gather_endpoints,
                scatter_add_endpoints,
            )

            xi, xj = gather_endpoints(x, pairs)
            m_i = xj + edge_attr
            m_j = xi + edge_attr
            if act is not None:
                m_i, m_j = act(m_i), act(m_j)
            lm = local_mask[..., None].astype(m_i.dtype)
            agg = scatter_add_endpoints(m_i * lm, m_j * lm, pairs)
        else:
            # messages over all pairs, masked on aggregation
            msg = x[:, None, :, :] + edge_attr  # (B, N_i, N_j, H): x_j + e_ij
            if act is not None:
                msg = act(msg)
            agg = jnp.einsum("bij,bijh->bih", local_mask.astype(msg.dtype), msg)
        out = (1.0 + eps) * x + agg
        return MultiLayerPerceptron(
            (self.hidden_dim, self.hidden_dim), activation=self.activation,
            dtype=self.dtype, name="nn",
        )(out, train)


class GINEncoder(nn.Module):
    """Atom embedding + num_convs GINEConv layers, each followed by masked
    BatchNorm (AGDIFF addition), activation (all but the last conv), and a
    residual connection (reference: gin.py:75-148, concat_hidden=False)."""

    hidden_dim: int
    num_convs: int = 3
    activation: str = "relu"
    short_cut: bool = True
    concat_hidden: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, node_mask, local_mask, edge_attr, train: bool,
                 pairs=None):
        act = activation_by_name(self.activation)
        h = nn.Embed(
            100, self.hidden_dim, embedding_init=nn.initializers.normal(1.0),
            name="node_emb", param_dtype=jnp.float32,
        )(z).astype(self.dtype)

        hiddens = []
        conv_input = h
        for i in range(self.num_convs):
            hidden = GINEConv(
                self.hidden_dim, activation=self.activation, dtype=self.dtype,
                name=f"convs_{i}",
            )(conv_input, local_mask, edge_attr, train, pairs)
            hidden = MaskedBatchNorm(
                self.hidden_dim, dtype=self.dtype, name=f"batch_norms_{i}"
            )(hidden, node_mask, train)
            if i < self.num_convs - 1 and act is not None:
                hidden = act(hidden)
            if self.short_cut:
                hidden = hidden + conv_input
            hiddens.append(hidden)
            conv_input = hidden

        if self.concat_hidden:
            return jnp.concatenate(hiddens, axis=-1)
        return hiddens[-1]
