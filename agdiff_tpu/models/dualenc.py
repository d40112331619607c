"""DualEncoderEpsNetwork — the top-level score network.

Reference: src/agdiff/models/epsnet/dualenc.py:54-251 (module + forward) and
253-395 (diffusion loss). The dense-masked rewrite:

  * the working graph (order-extended bonds  union  radius graph) is a masked
    predicate over the (B, N, N) pair block (ops.graph.radius_union_mask);
  * per-edge quantities are (B, N, N[, C]) tensors consumed under masks;
  * the forward is time-unconditioned, exactly like the reference (the
    time_step argument of dualenc.py:142-251 is never read; noise level
    enters only the loss target and the sampler step size — SURVEY.md 2.6);
  * sigma_edge is fixed to ones in the diffusion branch (dualenc.py:184-186),
    so the 1/sigma_edge rescale of edge scores is the identity and is omitted.

Quirk parity: the reference constructs an `edge_encoder_local` that is never
used — the local branch re-invokes `edge_encoder_global`
(dualenc.py:214-216), so edge_encoder_local receives no gradients. With
``config.tie_edge_encoders=True`` (default, reference behaviour) the local
branch reuses the global encoder's output (bit-identical to calling it twice)
and no dead parameter block is allocated. Set it False to give the local
branch its own encoder (the presumably-intended architecture).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from agdiff_tpu.config import ModelConfig
from agdiff_tpu.data.graph_batch import GraphBatch
from agdiff_tpu.nn.edge_encoders import get_edge_encoder
from agdiff_tpu.nn.gin import GINEncoder
from agdiff_tpu.nn.mlp import MultiLayerPerceptron
from agdiff_tpu.nn.schnet import SchNetEncoder
from agdiff_tpu.ops.geometry import pairwise_distance
from agdiff_tpu.ops.graph import extend_graph_order_dense, radius_union_mask


class ModelOutput(NamedTuple):
    """Dense analog of the reference forward's return_edges=True tuple
    (dualenc.py:241-249)."""

    edge_inv_global: jax.Array  # (B, N, N) distance-score, global branch
    edge_inv_local: jax.Array   # (B, N, N) distance-score, local branch
    edge_mask: jax.Array        # (B, N, N) bool working-graph edges
    edge_type: jax.Array        # (B, N, N) int32
    edge_length: jax.Array      # (B, N, N) distances at the input positions
    local_mask: jax.Array       # (B, N, N) bool bond-graph edges


def _dtype(config: ModelConfig):
    return jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32


class DualEncoderEpsNetwork(nn.Module):
    """Two encoders (global SchNet on the radius-union graph, local GIN on the
    bond graph) -> per-edge invariant distance scores via pairwise MLPs."""

    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        batch: GraphBatch,
        *,
        train: bool = False,
        extend_order: bool = False,
        extend_radius: bool = True,
    ) -> ModelOutput:
        """Args mirror the reference forward (dualenc.py:142-156):
        extend_order applies in-jit bond-order extension (normally done on the
        host at collation — pass False); extend_radius unions the radius graph
        (False at generation time when only bond scores matter is NOT
        reference behaviour; the reference passes extend_order=False,
        extend_radius=True at test time, scripts/test.py:155).
        """
        cfg = self.config
        dtype = _dtype(cfg)
        pos = batch.pos.astype(dtype)
        node_mask = batch.node_mask

        bond_adj = batch.bond_adj
        if extend_order:
            bond_adj = extend_graph_order_dense(bond_adj, order=cfg.edge_order)

        dist = pairwise_distance(pos)  # (B, N, N)
        if extend_radius:
            edge_mask, edge_type, local_mask = radius_union_mask(
                dist, bond_adj, node_mask, cfg.cutoff
            )
        else:
            n = dist.shape[-1]
            pair = (
                node_mask[:, :, None] & node_mask[:, None, :]
                & ~jnp.eye(n, dtype=bool)[None]
            )
            local_mask = (bond_adj > 0) & pair
            edge_mask = local_mask
            edge_type = jnp.where(edge_mask, bond_adj, 0).astype(jnp.int32)

        # packed-pair mode (cfg.packed_pairs): every per-edge tensor lives on
        # the N(N-1)/2 unordered pairs instead of the N^2 dense block —
        # halves forward volume AND the residuals the backward saves. All
        # per-edge quantities are symmetric; BatchNorm is node-space, so the
        # semantics are identical (tests/test_packed_train.py).
        pairs = None
        if cfg.packed_pairs:
            from agdiff_tpu.ops.pairs import pack_plane, triu_pairs

            pairs = triu_pairs(dist.shape[-1], dtype)
            edge_length = pack_plane(dist, pairs)[..., None]  # (B, P, 1)
            em_in = pack_plane(edge_mask, pairs)
            lm_in = pack_plane(local_mask, pairs)
            et_in = pack_plane(edge_type, pairs)
        else:
            edge_length = dist[..., None]  # (B, N, N, 1)
            em_in, lm_in, et_in = edge_mask, local_mask, edge_type

        # --- edge encoders ---
        edge_attr_global = get_edge_encoder(
            cfg, dtype, name="edge_encoder_global"
        )(edge_length, et_in)
        if cfg.tie_edge_encoders:
            # reference re-invokes the *global* encoder for the local branch
            # (dualenc.py:214-216) — identical inputs, identical output.
            edge_attr_local = edge_attr_global
        else:
            edge_attr_local = get_edge_encoder(
                cfg, dtype, name="edge_encoder_local"
            )(edge_length, et_in)

        # --- global branch: SchNet on the full working graph ---
        # remat: recompute encoder activations in backward instead of saving
        # the (B, N, N, C) edge tensors (HBM-bound training step). train is a
        # static Python bool -> static_argnums (0 = self).
        SchNet = (nn.remat(SchNetEncoder, static_argnums=(6,))
                  if cfg.remat else SchNetEncoder)
        GIN = (nn.remat(GINEncoder, static_argnums=(5,))
               if cfg.remat else GINEncoder)

        node_attr_global = SchNet(
            hidden_channels=cfg.hidden_dim,
            num_filters=cfg.hidden_dim,
            num_interactions=cfg.num_convs,
            cutoff=cfg.cutoff,
            smooth=cfg.smooth_conv,
            embedding_max_norm=cfg.embedding_max_norm,
            dtype=dtype,
            name="encoder_global",
        )(batch.atom_type, node_mask, em_in, edge_length, edge_attr_global,
          train, pairs)

        h_pair_global = _assemble_pair_feature(node_attr_global,
                                               edge_attr_global, pairs)
        edge_inv_global = MultiLayerPerceptron(
            (cfg.hidden_dim, cfg.hidden_dim // 2, 1), activation=cfg.mlp_act,
            dtype=dtype, name="grad_global_dist_mlp",
        )(h_pair_global, train)[..., 0]

        # --- local branch: GIN on the bond graph ---
        node_attr_local = GIN(
            hidden_dim=cfg.hidden_dim,
            num_convs=cfg.num_convs_local,
            dtype=dtype,
            name="encoder_local",
        )(batch.atom_type, node_mask, lm_in, edge_attr_local, train, pairs)

        h_pair_local = _assemble_pair_feature(node_attr_local,
                                              edge_attr_local, pairs)
        edge_inv_local = MultiLayerPerceptron(
            (cfg.hidden_dim, cfg.hidden_dim // 2, 1), activation=cfg.mlp_act,
            dtype=dtype, name="grad_local_dist_mlp",
        )(h_pair_local, train)[..., 0]

        if pairs is not None:
            # mirror packed symmetric scores to the dense (B, N, N) layout
            # (diagonal gets pair 0's value — junk, like the dense path's
            # h_i*h_i diagonal; every consumer masks)
            from agdiff_tpu.ops.pairs import mirror_plane

            edge_inv_global = mirror_plane(edge_inv_global, pairs)
            edge_inv_local = mirror_plane(edge_inv_local, pairs)

        return ModelOutput(
            edge_inv_global=edge_inv_global.astype(jnp.float32),
            edge_inv_local=edge_inv_local.astype(jnp.float32),
            edge_mask=edge_mask,
            edge_type=edge_type,
            edge_length=dist.astype(jnp.float32),
            local_mask=local_mask,
        )


def _assemble_pair_feature(node_attr, edge_attr, pairs=None):
    """h_pair_ij = concat(h_i * h_j, e_ij) (reference: common.py:106-109).
    With `pairs` (packed mode) edge_attr is (B, P, C) and the product runs
    over endpoint rows instead of the dense outer block."""
    if pairs is not None:
        prod = node_attr[:, pairs.iu, :] * node_attr[:, pairs.ju, :]
    else:
        prod = node_attr[:, :, None, :] * node_attr[:, None, :, :]
    return jnp.concatenate([prod, edge_attr], axis=-1)


def get_model(config: ModelConfig) -> DualEncoderEpsNetwork:
    """Factory (reference: epsnet/__init__.py:4-8)."""
    if config.network != "dualenc":
        raise NotImplementedError(config.network)
    return DualEncoderEpsNetwork(config)


def init_model(
    config: ModelConfig, key: jax.Array, max_nodes: int = 32, batch: int = 2
):
    """Initialize parameters + batch_stats with a dummy batch."""
    model = get_model(config)
    dummy = GraphBatch(
        atom_type=jnp.ones((batch, max_nodes), jnp.int32) * 6,
        pos=jax.random.normal(key, (batch, max_nodes, 3)),
        node_mask=jnp.ones((batch, max_nodes), bool),
        bond_adj=jnp.zeros((batch, max_nodes, max_nodes), jnp.int32)
        .at[:, 0, 1].set(1).at[:, 1, 0].set(1),
        graph_mask=jnp.ones((batch,), bool),
    )
    variables = model.init(key, dummy, train=False)
    return model, variables
