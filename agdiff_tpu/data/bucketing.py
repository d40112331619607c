"""Bucketed padding and collation: molecules -> GraphBatch.

The reference handles variable molecule size via PyG dynamic batching (one
concatenated node list + `batch` index vector). The TPU equivalent is static
bucketing: pick the smallest bucket N >= num_nodes, pad node arrays to N, and
collate B molecules of one bucket into a dense GraphBatch. XLA compiles one
program per bucket.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from agdiff_tpu.chem.mol import Molecule
from agdiff_tpu.data.graph_batch import GraphBatch, numpy_graph_batch
from agdiff_tpu.data.transforms import extend_bond_order


def pick_bucket(num_nodes: int, buckets: Sequence[int]) -> int:
    """Smallest bucket that fits, else raise."""
    for b in sorted(buckets):
        if num_nodes <= b:
            return b
    raise ValueError(
        f"Molecule with {num_nodes} atoms exceeds largest bucket {max(buckets)}"
    )


def _extended_adjacency(mol: Molecule, edge_order: int) -> np.ndarray:
    """Order-extended adjacency, memoized on the molecule (the extension is
    position-independent and the training loader re-draws molecules every
    batch; the reference recomputes it per forward, common.py:135-205)."""
    key = f"_ext_adj_{edge_order}"
    cached = mol.meta.get(key)
    if cached is None:
        raw = mol.bond_adjacency()
        cached = extend_bond_order(raw, order=edge_order) if edge_order else raw
        mol.meta[key] = cached
    return cached


def pad_molecule(
    mol: Molecule, max_nodes: int, edge_order: int = 3
) -> Dict[str, np.ndarray]:
    """Pad one molecule to max_nodes and precompute its extended adjacency."""
    n = mol.num_nodes
    if n > max_nodes:
        raise ValueError(f"molecule has {n} > {max_nodes} atoms")
    atom_type = np.zeros((max_nodes,), np.int32)
    atom_type[:n] = mol.atom_type
    pos = np.zeros((max_nodes, 3), np.float32)
    pos[:n] = mol.pos
    node_mask = np.zeros((max_nodes,), bool)
    node_mask[:n] = True
    bond_adj = np.zeros((max_nodes, max_nodes), np.int32)
    bond_adj[:n, :n] = _extended_adjacency(mol, edge_order)
    return {
        "atom_type": atom_type,
        "pos": pos,
        "node_mask": node_mask,
        "bond_adj": bond_adj,
    }


def pad_molecules(
    mols: List[Molecule],
    max_nodes: int,
    edge_order: int = 3,
    batch_size: Optional[int] = None,
) -> GraphBatch:
    """Collate molecules (all fitting in `max_nodes`) into one GraphBatch.

    If batch_size is given and larger than len(mols), the batch is padded with
    empty graphs (graph_mask False) so shapes stay static.
    """
    b = batch_size or len(mols)
    padded = [pad_molecule(m, max_nodes, edge_order) for m in mols]
    atom_type = np.zeros((b, max_nodes), np.int32)
    pos = np.zeros((b, max_nodes, 3), np.float32)
    node_mask = np.zeros((b, max_nodes), bool)
    bond_adj = np.zeros((b, max_nodes, max_nodes), np.int32)
    graph_mask = np.zeros((b,), bool)
    for k, p in enumerate(padded):
        atom_type[k] = p["atom_type"]
        pos[k] = p["pos"]
        node_mask[k] = p["node_mask"]
        bond_adj[k] = p["bond_adj"]
        graph_mask[k] = True
    return numpy_graph_batch(atom_type, pos, node_mask, bond_adj, graph_mask)


def repeat_molecule(mol: Molecule, num_repeats: int, max_nodes: int,
                    edge_order: int = 3) -> GraphBatch:
    """One molecule replicated num_repeats times (the generation-time pattern:
    reference scripts/test.py:135-141 repeat_data(data, 2 * num_refs))."""
    return pad_molecules([mol] * num_repeats, max_nodes, edge_order)


def group_by_bucket(
    mols: List[Molecule], buckets: Sequence[int]
) -> Dict[int, List[int]]:
    """Molecule indices grouped by their bucket size."""
    groups: Dict[int, List[int]] = {}
    for idx, m in enumerate(mols):
        b = pick_bucket(m.num_nodes, buckets)
        groups.setdefault(b, []).append(idx)
    return groups
