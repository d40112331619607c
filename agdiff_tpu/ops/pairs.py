"""Static unordered-pair (upper-triangle) packing for TRAINING forwards.

Every per-edge quantity of the working graph is symmetric in (i, j)
(distances, types, masks, edge encodings, filter weights, pair scores), so
the N(N-1)/2 unordered pairs carry all information of the N^2 dense block:
packing halves the volume of every per-edge tensor in the forward AND of
every residual the backward saves. Unlike the inference engines
(models/fast_forward.py, models/tight_forward.py) this machinery is built
from STATIC numpy triu indices at trace time — XLA sees constants — and is
shared by all graphs in the batch (pads are handled by the packed masks).

Aggregation back to nodes uses constant 0/1 endpoint selectors on the MXU:
    out = (w * x[ju]) @ OH_i + (w * x[iu]) @ OH_j
which is exactly sum_j mask_ij w_ij x_j of the dense einsum.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class TriuPairs(NamedTuple):
    """Static pair machinery for one bucket size N (P = N(N-1)/2 pairs)."""

    iu: jnp.ndarray       # (P,) i32 — endpoint i (i < j)
    ju: jnp.ndarray       # (P,) i32 — endpoint j
    oh_i: jnp.ndarray     # (P, N) — one-hot endpoint-i selector
    oh_j: jnp.ndarray     # (P, N)
    pair_id: jnp.ndarray  # (N, N) i32 — dense cell -> pair slot (diag -> 0)

    @property
    def num_nodes(self) -> int:
        return self.oh_i.shape[1]


def triu_pairs(n: int, dtype=jnp.float32) -> TriuPairs:
    iu, ju = np.triu_indices(n, k=1)
    p = len(iu)
    pair_id = np.zeros((n, n), np.int32)
    pair_id[iu, ju] = np.arange(p)
    pair_id = pair_id + pair_id.T  # symmetric; diagonal stays 0 (masked)
    oh_i = np.zeros((p, n), np.float32)
    oh_j = np.zeros((p, n), np.float32)
    oh_i[np.arange(p), iu] = 1.0
    oh_j[np.arange(p), ju] = 1.0
    return TriuPairs(
        iu=jnp.asarray(iu, jnp.int32),
        ju=jnp.asarray(ju, jnp.int32),
        oh_i=jnp.asarray(oh_i, dtype),
        oh_j=jnp.asarray(oh_j, dtype),
        pair_id=jnp.asarray(pair_id),
    )


def pack_plane(a, pairs: TriuPairs):
    """(B, N, N[, C]) symmetric -> (B, P[, C]) on the upper triangle."""
    return a[:, pairs.iu, pairs.ju]


def mirror_plane(s, pairs: TriuPairs):
    """(B, P) packed symmetric plane -> (B, N, N). The diagonal receives
    pair 0's value — junk, exactly like the dense path's h_i*h_i diagonal;
    every consumer masks."""
    return s[:, pairs.pair_id]


def gather_endpoints(x, pairs: TriuPairs):
    """(B, N, F) node rows -> ((B, P, F) at i, (B, P, F) at j)."""
    return x[:, pairs.iu], x[:, pairs.ju]


def scatter_add_endpoints(msg_i, msg_j, pairs: TriuPairs):
    """Sum per-pair messages to their endpoint nodes: (B, P, F) x2 ->
    (B, N, F). msg_i lands on endpoint i, msg_j on endpoint j."""
    oh_i = pairs.oh_i.astype(msg_i.dtype)
    oh_j = pairs.oh_j.astype(msg_j.dtype)
    return (jnp.einsum("bpf,pn->bnf", msg_i, oh_i)
            + jnp.einsum("bpf,pn->bnf", msg_j, oh_j))
