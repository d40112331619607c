"""GraphBatch — the static-shape padded graph representation.

This is the core TPU-first representational decision: instead of PyG's
variadic edge-list batching (reference: torch_geometric Batch + torch-scatter
everywhere), molecules are padded into dense per-graph blocks:

  atom_type (B, N) int32, pos (B, N, 3) f32, node_mask (B, N) bool,
  bond_adj (B, N, N) int32 typed adjacency.

Consequences:
  * The radius-graph union (reference: common.py:208-233, torch-cluster CUDA)
    becomes a masked pairwise-distance predicate computed in-jit each step.
  * Cross-graph edges are impossible by construction (the B dimension
    separates graphs), so no `batch` index vector is needed.
  * scatter_add message aggregation becomes dense einsum -> MXU-friendly.
  * XLA compiles once per bucket size N.

``bond_adj`` holds the *order-extended* typed adjacency (types 1..21 bonds,
23/24 for 2-/3-hop; see chem.constants). The extension is position-independent
(reference recomputes it every forward, common.py:135-205; and offline at test
time via AddHigherOrderEdges, transforms.py:12-71) so it is precomputed on the
host at collation time.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax.struct import dataclass as pytree_dataclass


@pytree_dataclass
class GraphBatch:
    """A batch of B molecules padded to N nodes each. All arrays are leaves of
    a JAX pytree; shapes are static per bucket."""

    atom_type: jax.Array   # (B, N) int32
    pos: jax.Array         # (B, N, 3) float32
    node_mask: jax.Array   # (B, N) bool
    bond_adj: jax.Array    # (B, N, N) int32 — order-extended typed adjacency
    graph_mask: jax.Array  # (B,) bool — False for padding graphs

    @property
    def num_graphs(self) -> int:
        return self.atom_type.shape[0]

    @property
    def max_nodes(self) -> int:
        return self.atom_type.shape[1]

    @property
    def num_nodes_per_graph(self) -> jax.Array:
        """(B,) int32 count of real nodes (reference: CountNodesPerGraph,
        transforms.py:189-196)."""
        return jnp.sum(self.node_mask.astype(jnp.int32), axis=1)

    def pair_mask(self) -> jax.Array:
        """(B, N, N) bool — valid (off-diagonal, both-real) node pairs."""
        m = self.node_mask[:, :, None] & self.node_mask[:, None, :]
        eye = jnp.eye(self.max_nodes, dtype=bool)[None]
        return m & ~eye

    def replace_pos(self, pos: jax.Array) -> "GraphBatch":
        return self.replace(pos=pos)


def stack_batches(batches):
    """Stack a list of same-shape GraphBatches along a new leading axis.
    Host-resident (numpy) leaves stack on host so the stacked chunk crosses
    to the device as ONE transfer at dispatch."""
    def _stack(*xs):
        if all(isinstance(x, np.ndarray) for x in xs):
            return np.stack(xs)
        return jnp.stack(xs)

    return jax.tree_util.tree_map(_stack, *batches)


def numpy_graph_batch(
    atom_type: np.ndarray,
    pos: np.ndarray,
    node_mask: np.ndarray,
    bond_adj: np.ndarray,
    graph_mask: Optional[np.ndarray] = None,
) -> GraphBatch:
    """Build a GraphBatch from host numpy arrays — and KEEP it host-resident.

    jnp.asarray here would eagerly push each array to the default device,
    array by array; through the remote-chip tunnel (~25 ms/transfer) that
    capped the real trainer at ~6 it/s while the loader produced 477
    batches/s. Numpy leaves instead cross at jit dispatch, as one batched
    transfer per call (and chunked train steps stack 16 batches per
    transfer, see stack_batches)."""
    if graph_mask is None:
        graph_mask = node_mask.any(axis=1)
    return GraphBatch(
        atom_type=np.asarray(atom_type, np.int32),
        pos=np.ascontiguousarray(pos, np.float32),
        node_mask=np.asarray(node_mask, bool),
        bond_adj=np.asarray(bond_adj, np.int32),
        graph_mask=np.asarray(graph_mask, bool),
    )
