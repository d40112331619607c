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


# --------------------------------------------------------------------------
# Auxiliary transforms (reference: src/agdiff/utils/transforms.py:74-186 —
# not used by the train/test scripts, provided for API completeness).
# Each operates on a Molecule and stores results in .meta.
# --------------------------------------------------------------------------

def add_edge_length(mol) -> None:
    """meta['edge_length'] = per-directed-edge distances (AddEdgeLength)."""
    i, j = mol.bond_index
    mol.meta["edge_length"] = np.linalg.norm(
        mol.pos[i] - mol.pos[j], axis=-1
    ).astype(np.float32)


def add_placeholder(mol) -> None:
    """meta placeholders pos_gen / d_gen / d_recover = -1 (AddPlaceHolder)."""
    mol.meta["pos_gen"] = -np.ones_like(mol.pos)
    e = mol.bond_index.shape[1]
    mol.meta["d_gen"] = -np.ones((e, 1), np.float32)
    mol.meta["d_recover"] = -np.ones((e, 1), np.float32)


def add_edge_name(mol, asymmetric: bool = True) -> None:
    """meta['edge_name'] = human-readable edge labels (AddEdgeName)."""
    from agdiff_tpu.chem.constants import ATOM_SYMBOLS, BOND_NAMES

    names = dict(BOND_NAMES)
    names[len(BOND_NAMES) + 1] = "Angle"
    names[len(BOND_NAMES) + 2] = "Dihedral"
    if "edge_length" not in mol.meta:
        add_edge_length(mol)
    out = []
    for k in range(mol.bond_index.shape[1]):
        tail, head = int(mol.bond_index[0, k]), int(mol.bond_index[1, k])
        if asymmetric and tail >= head:
            out.append("")
            continue
        t = int(mol.bond_type[k])
        label = names.get(t, f"E{t}")
        tail_sym = ATOM_SYMBOLS.get(int(mol.atom_type[tail]), "X")
        head_sym = ATOM_SYMBOLS.get(int(mol.atom_type[head]), "X")
        out.append(
            f"{label}_{tail_sym}_{head_sym}_{tail}_{head}"
            f"_{mol.meta['edge_length'][k]:.3f}"
        )
    mol.meta["edge_name"] = out


def add_angle_dihedral(mol) -> None:
    """meta['angle_index'] (3, A) and meta['dihedral_index'] (4, D) over the
    bond graph (AddAngleDihedral; same triplet/quartet iteration rules)."""
    adj = mol.bond_adjacency() > 0
    n = adj.shape[0]
    angles = [
        (j, k, l)
        for j in range(n) for k in range(n) for l in range(n)
        if adj[j, k] and adj[k, l] and j != k and k != l and j < l
    ]
    dihedrals = []
    for i in range(n):
        for j in range(i + 1, n):
            if not adj[i, j]:
                continue
            for k in range(n):
                for l in range(n):
                    if k in (i, j) or l in (i, j):
                        continue
                    if adj[k, i] and adj[l, j]:
                        dihedrals.append((k, i, j, l))
    mol.meta["angle_index"] = (
        np.array(angles, np.int32).T if angles else np.zeros((3, 0), np.int32)
    )
    mol.meta["dihedral_index"] = (
        np.array(dihedrals, np.int32).T
        if dihedrals else np.zeros((4, 0), np.int32)
    )


def symmetric_edge_noise(
    rng: np.random.Generator, bond_index: np.ndarray
) -> np.ndarray:
    """Per-undirected-edge Gaussian noise duplicated onto both directed
    copies (reference generate_symmetric_edge_noise, common.py:112-132)."""
    i, j = bond_index
    lo, hi = np.minimum(i, j), np.maximum(i, j)
    key = hi.astype(np.int64) * (hi + 1) + lo
    uniq, inverse = np.unique(key, return_inverse=True)
    noise = rng.normal(size=len(uniq)).astype(np.float32)
    return noise[inverse][:, None]
