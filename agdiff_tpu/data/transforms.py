"""Host-side graph transforms (numpy).

The key one is bond-order extension: add k-hop edges (k <= order) to the bond
graph with distinct edge types. Semantics match the reference exactly
(reference: src/agdiff/models/common.py:135-205 and the offline variant
AddHigherOrderEdges, src/agdiff/utils/transforms.py:12-71):

  order_mat[i, j] = k where k is the shortest hop count (1..order) between
  i and j in the bond graph (0 if farther than `order` or i == j).
  1-hop entries keep their chemical bond type; k-hop (k >= 2) entries get type
  NUM_BOND_TYPES + k - 1. The assertion that bond types and higher-order types
  never collide (common.py:186) holds by construction here.

Because the extension depends only on bonds (not positions), it is precomputed
once per molecule on the host instead of inside every forward pass.
"""

from __future__ import annotations

import numpy as np

from agdiff_tpu.chem.constants import NUM_BOND_TYPES


def extend_bond_order(
    bond_adj: np.ndarray, order: int = 3, num_types: int = NUM_BOND_TYPES
) -> np.ndarray:
    """Extend a dense typed bond adjacency with higher-order edges.

    Args:
      bond_adj: (N, N) int typed adjacency (0 = no bond).
      order: max hop count to add (reference default edge_order=3).
    Returns:
      (N, N) int32 typed adjacency with k-hop edges typed num_types + k - 1.
    """
    adj = (bond_adj > 0).astype(np.int64)
    n = adj.shape[0]
    eye = np.eye(n, dtype=np.int64)
    # reach[k] = nodes reachable within k hops (incl. self)
    reach_prev = eye
    reach = ((adj + eye) > 0).astype(np.int64)
    hop = np.zeros((n, n), dtype=np.int64)
    hop += (reach - reach_prev) * 1
    for k in range(2, order + 1):
        reach_next = ((reach @ ((adj + eye) > 0).astype(np.int64)) > 0).astype(np.int64)
        hop += (reach_next - reach) * k
        reach = reach_next
    # 1-hop keeps chemical type; k>=2 hop gets num_types + k - 1
    high = np.where(hop > 1, num_types + hop - 1, 0)
    out = np.where(hop == 1, bond_adj, high)
    assert (np.where(hop == 1, bond_adj, 0) * high == 0).all()
    return out.astype(np.int32)


def edges_from_adjacency(adj: np.ndarray):
    """Dense typed adjacency -> (edge_index (2, E), edge_type (E,)) in
    row-major order (the order dense_to_sparse + coalesce produces in the
    reference)."""
    i, j = np.nonzero(adj)
    return np.stack([i, j]).astype(np.int32), adj[i, j].astype(np.int32)


def center_positions(pos: np.ndarray) -> np.ndarray:
    """Zero the center of mass (host-side convenience)."""
    return pos - pos.mean(axis=0, keepdims=True)
