"""Dense in-jit graph construction.

The reference builds its working graph per forward pass as
(bond-order extension) union (radius graph), via dense matrix powers +
torch-cluster radius_graph + sparse coalesce (reference:
src/agdiff/models/common.py:135-264). Here both pieces are dense masked ops:

  * radius_union_mask: the radius graph is a pairwise-distance predicate;
    the union with the typed bond graph preserves bond types exactly because
    radius-only edges carry type 0 (the sparse-add semantics of
    common.py:226-231: coalesce sums values and radius edges contribute 0).
  * extend_graph_order_dense: in-jit equivalent of _extend_graph_order for
    callers that pass raw (unextended) bond adjacency; normally the extension
    is precomputed on the host (data.transforms.extend_bond_order) since it is
    position-independent.

Note one deliberate divergence: PyG's radius_graph caps neighbours at
max_num_neighbors=32 (an arbitrary truncation); the dense predicate has no
cap. For QM9-size molecules the cap never binds; for larger ones the dense
version is strictly more faithful to "all pairs within cutoff".
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from agdiff_tpu.chem.constants import NUM_BOND_TYPES


def radius_union_mask(
    dist: jax.Array,       # (B, N, N) pairwise distances
    bond_adj: jax.Array,   # (B, N, N) int typed adjacency (order-extended)
    node_mask: jax.Array,  # (B, N) bool
    cutoff: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Union of radius graph and typed bond graph.

    Returns:
      edge_mask:  (B, N, N) bool — pairs that are edges of the working graph.
      edge_type:  (B, N, N) int32 — bond types (0 for radius-only edges).
      local_mask: (B, N, N) bool — edges with type > 0 (the bond/local graph,
                  reference is_local_edge, dualenc.py:566-567).
    """
    n = dist.shape[-1]
    pair = (
        node_mask[:, :, None]
        & node_mask[:, None, :]
        & ~jnp.eye(n, dtype=bool)[None]
    )
    within = dist <= cutoff
    local_mask = (bond_adj > 0) & pair
    edge_mask = (within & pair) | local_mask
    edge_type = jnp.where(edge_mask, bond_adj, 0).astype(jnp.int32)
    return edge_mask, edge_type, local_mask


def extend_graph_order_dense(
    bond_adj: jax.Array, order: int = 3, num_types: int = NUM_BOND_TYPES
) -> jax.Array:
    """In-jit dense bond-order extension, same semantics as the host version
    (data.transforms.extend_bond_order; reference common.py:135-205).

    bond_adj: (..., N, N) int typed adjacency (0 = none). Static `order`.
    """
    adj = (bond_adj > 0).astype(jnp.int32)
    n = adj.shape[-1]
    eye = jnp.eye(n, dtype=jnp.int32)
    one_hop = ((adj + eye) > 0).astype(jnp.int32)
    reach_prev = jnp.broadcast_to(eye, adj.shape)
    reach = jnp.broadcast_to(one_hop, adj.shape)
    hop = (reach - reach_prev) * 1
    for k in range(2, order + 1):
        nxt = (
            jnp.matmul(reach, one_hop, preferred_element_type=jnp.int32) > 0
        ).astype(jnp.int32)
        hop = hop + (nxt - reach) * k
        reach = nxt
    high = jnp.where(hop > 1, num_types + hop - 1, 0)
    return jnp.where(hop == 1, bond_adj, high).astype(jnp.int32)
