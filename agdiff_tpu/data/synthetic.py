"""Synthetic molecule generation (RDKit-free) for tests and benchmarks.

Generates chemically-plausible random molecular graphs: a random spanning tree
over heavy atoms with realistic bond lengths, optional rings, hydrogens filled
to typical valence, and 3D coordinates from a crude embedding. These are NOT
meant to be valid chemistry — they exercise the exact tensor shapes, edge-type
vocabulary, and statistics of GEOM-like data so the full train/sample/eval
stack runs without RDKit or the GEOM download (reference data pipeline:
src/agdiff/utils/datasets.py:559-710).
"""

from __future__ import annotations

from typing import List

import numpy as np

from agdiff_tpu.chem.constants import BondType
from agdiff_tpu.chem.mol import Molecule

_HEAVY = np.array([6, 6, 6, 6, 7, 8, 9])  # C-rich, like QM9
_VALENCE = {6: 4, 7: 3, 8: 2, 9: 1, 1: 1}
_BOND_LEN = {6: 1.52, 7: 1.45, 8: 1.41, 9: 1.38, 1: 1.09}


def random_molecule(
    rng: np.random.Generator,
    num_heavy: int = 9,
    add_hydrogens: bool = True,
    num_conformers: int = 0,
    jitter: float = 0.15,
) -> Molecule:
    """A random tree-structured molecule with approximate 3D geometry."""
    heavy = rng.choice(_HEAVY, size=num_heavy).astype(np.int32)
    heavy[0] = 6
    pairs = []  # undirected (i, j, type)
    # random spanning tree over heavy atoms
    pos = np.zeros((num_heavy, 3), np.float64)
    parent = np.zeros(num_heavy, np.int64)
    for i in range(1, num_heavy):
        p = int(rng.integers(0, i))
        parent[i] = p
        pairs.append((p, i, int(BondType.SINGLE)))
        direction = rng.normal(size=3)
        direction /= np.linalg.norm(direction)
        length = 0.5 * (_BOND_LEN[int(heavy[p])] + _BOND_LEN[int(heavy[i])])
        pos[i] = pos[p] + direction * length
    # simple steric relaxation: push non-bonded heavy atoms apart
    for _ in range(30):
        diff = pos[:, None] - pos[None, :]
        dist = np.linalg.norm(diff, axis=-1) + np.eye(num_heavy)
        force = np.where(dist[..., None] < 1.8, diff / dist[..., None] ** 3, 0.0)
        pos += 0.05 * force.sum(axis=1)
        for i in range(1, num_heavy):  # restore bond lengths
            p = parent[i]
            v = pos[i] - pos[p]
            length = 0.5 * (_BOND_LEN[int(heavy[p])] + _BOND_LEN[int(heavy[i])])
            pos[i] = pos[p] + v / (np.linalg.norm(v) + 1e-9) * length

    atom_type = list(heavy)
    positions = list(pos)
    degree = np.zeros(num_heavy, np.int64)
    for i, j, _ in pairs:
        degree[i] += 1
        degree[j] += 1
    if add_hydrogens:
        for i in range(num_heavy):
            for _ in range(max(0, _VALENCE[int(heavy[i])] - int(degree[i]))):
                h_idx = len(atom_type)
                atom_type.append(1)
                d = rng.normal(size=3)
                d /= np.linalg.norm(d)
                positions.append(pos[i] + d * 1.09)
                pairs.append((i, h_idx, int(BondType.SINGLE)))

    n = len(atom_type)
    src, dst, types = [], [], []
    for i, j, t in pairs:
        src += [i, j]
        dst += [j, i]
        types += [t, t]
    # row-major sort to match reference edge ordering (datasets.py:356-360)
    order = np.lexsort((np.array(dst), np.array(src)))
    primary = np.asarray(positions, np.float32)
    primary = primary - primary.mean(0, keepdims=True)
    mol = Molecule(
        atom_type=np.array(atom_type, np.int32),
        pos=primary,
        bond_index=np.stack([np.array(src)[order], np.array(dst)[order]]),
        bond_type=np.array(types, np.int32)[order],
        smiles=f"SYN-{num_heavy}-{int(rng.integers(1 << 30))}",
    )
    if num_conformers > 0:
        refs = [
            primary + rng.normal(scale=jitter, size=(n, 3)).astype(np.float32)
            for _ in range(num_conformers)
        ]
        mol.pos_ref = np.concatenate(refs, axis=0)
    return mol


def synthetic_dataset(
    num_molecules: int,
    seed: int = 0,
    min_heavy: int = 4,
    max_heavy: int = 9,
    num_conformers: int = 0,
) -> List[Molecule]:
    rng = np.random.default_rng(seed)
    return [
        random_molecule(
            rng,
            num_heavy=int(rng.integers(min_heavy, max_heavy + 1)),
            num_conformers=num_conformers,
        )
        for _ in range(num_molecules)
    ]
