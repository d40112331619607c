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


def heavy_range(max_heavy: int, spread: int = 4) -> tuple:
    """Clamped (min_heavy, max_heavy) from a user-facing size knob.

    Without clamping, ``max(4, h - spread)`` exceeds ``h`` for h < 4 and
    ``rng.integers(low, high)`` raises. Result satisfies 4 <= min <= max.
    """
    hi = max(int(max_heavy), 4)
    lo = min(max(4, hi - spread), hi)
    return lo, hi


_TET_COS = 1.0 / 3.0                     # cos(70.53 deg): tetrahedral
_TET_SIN = np.sqrt(8.0) / 3.0
_TET_DIRS = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                     np.float64) / np.sqrt(3.0)  # root: 4 true vertices


def _frame(u, ref):
    """Deterministic orthonormal (v, w) perpendicular to u, seeded by ref."""
    v = ref - u * float(np.dot(ref, u))
    n = np.linalg.norm(v)
    if n < 1e-6:
        ref = np.array([0.0, 0.0, 1.0]) if abs(u[2]) < 0.9 else \
            np.array([1.0, 0.0, 0.0])
        v = ref - u * float(np.dot(ref, u))
        n = np.linalg.norm(v)
    v = v / n
    return v, np.cross(u, v)


def _rigid_place(pos_p, u, v, w, k, length):
    """k-th tetrahedral substituent direction off the bond axis u."""
    phi = k * (2.0 * np.pi / 3.0)
    d = u * _TET_COS + (v * np.cos(phi) + w * np.sin(phi)) * _TET_SIN
    return pos_p + d * length


def random_molecule(
    rng: np.random.Generator,
    num_heavy: int = 9,
    add_hydrogens: bool = True,
    num_conformers: int = 0,
    jitter: float = 0.15,
    rigid: bool = False,
) -> Molecule:
    """A random tree-structured molecule with approximate 3D geometry.

    rigid=False (default): bond DIRECTIONS are random — the 3D shape is
    underdetermined by the molecular graph (like free torsions), which puts
    an irreducible floor under MAT-R for models that only see the graph.
    rigid=True: a deterministic tetrahedral z-matrix embedding — geometry
    is a consistent function of local structure (sp3 angles, substituent
    slots ordered by construction), so conformation is fully learnable."""
    heavy = rng.choice(_HEAVY, size=num_heavy).astype(np.int32)
    heavy[0] = 6
    pairs = []  # undirected (i, j, type)
    # random spanning tree over heavy atoms
    pos = np.zeros((num_heavy, 3), np.float64)
    parent = np.zeros(num_heavy, np.int64)
    children: dict = {i: [] for i in range(num_heavy)}
    if rigid:
        for i in range(1, num_heavy):
            p = int(rng.integers(0, i))
            parent[i] = p
            children[p].append(i)
            pairs.append((p, i, int(BondType.SINGLE)))
        # deterministic tetrahedral placement, children in index order
        axis = {0: np.array([0.0, 0.0, 1.0])}  # root pseudo-bond axis
        order = sorted(range(1, num_heavy))
        slot = {i: 0 for i in range(num_heavy)}
        for i in order:  # generation order == BFS-compatible (parent < i)
            p = int(parent[i])
            length = 0.5 * (_BOND_LEN[int(heavy[p])]
                            + _BOND_LEN[int(heavy[i])])
            if p == 0:
                # root has no incoming bond: its (up to 4) substituents sit
                # on the true tetrahedral vertices
                pos[i] = pos[p] + _TET_DIRS[slot[p] % 4] * length
            else:
                u = axis[p]
                ref = axis.get(int(parent[p]), np.array([1.0, 0.0, 0.0]))
                v, w = _frame(u, ref)
                pos[i] = _rigid_place(pos[p], u, v, w, slot[p], length)
            slot[p] += 1
            d = pos[i] - pos[p]
            axis[i] = d / np.linalg.norm(d)
        # rigid tree embeddings can self-intersect (no excluded volume);
        # the steric relaxation is a DETERMINISTIC function of the
        # embedding, so geometry remains a function of the graph
        for _ in range(60):
            diff = pos[:, None] - pos[None, :]
            dist = np.linalg.norm(diff, axis=-1) + np.eye(num_heavy)
            force = np.where(dist[..., None] < 1.8,
                             diff / np.maximum(dist[..., None], 0.3) ** 3,
                             0.0)
            pos += 0.05 * force.sum(axis=1)
            for i in range(1, num_heavy):  # restore bond lengths
                p = int(parent[i])
                v = pos[i] - pos[p]
                length = 0.5 * (_BOND_LEN[int(heavy[p])]
                                + _BOND_LEN[int(heavy[i])])
                pos[i] = pos[p] + v / (np.linalg.norm(v) + 1e-9) * length
        # refresh bond axes for the H placement below
        for i in range(1, num_heavy):
            d = pos[i] - pos[int(parent[i])]
            axis[i] = d / np.linalg.norm(d)
    else:
        # NOTE: parent and direction draws stay INTERLEAVED — the original
        # rng call order — so rigid=False reproduces the exact molecules of
        # earlier rounds for a given seed
        for i in range(1, num_heavy):
            p = int(rng.integers(0, i))
            parent[i] = p
            children[p].append(i)
            pairs.append((p, i, int(BondType.SINGLE)))
            direction = rng.normal(size=3)
            direction /= np.linalg.norm(direction)
            length = 0.5 * (_BOND_LEN[int(heavy[p])]
                            + _BOND_LEN[int(heavy[i])])
            pos[i] = pos[p] + direction * length
        # simple steric relaxation: push non-bonded heavy atoms apart
        for _ in range(30):
            diff = pos[:, None] - pos[None, :]
            dist = np.linalg.norm(diff, axis=-1) + np.eye(num_heavy)
            force = np.where(dist[..., None] < 1.8,
                             diff / dist[..., None] ** 3, 0.0)
            pos += 0.05 * force.sum(axis=1)
            for i in range(1, num_heavy):  # restore bond lengths
                p = parent[i]
                v = pos[i] - pos[p]
                length = 0.5 * (_BOND_LEN[int(heavy[p])]
                                + _BOND_LEN[int(heavy[i])])
                pos[i] = pos[p] + v / (np.linalg.norm(v) + 1e-9) * length

    atom_type = list(heavy)
    positions = list(pos)
    degree = np.zeros(num_heavy, np.int64)
    for i, j, _ in pairs:
        degree[i] += 1
        degree[j] += 1
    if add_hydrogens:
        for i in range(num_heavy):
            free = max(0, _VALENCE[int(heavy[i])] - int(degree[i]))
            if rigid and free:
                # fill remaining tetrahedral slots deterministically
                base = len(children[i])
                if i == 0:
                    for k in range(free):
                        h_idx = len(atom_type)
                        atom_type.append(1)
                        positions.append(
                            pos[0] + _TET_DIRS[(base + k) % 4] * 1.09)
                        pairs.append((0, h_idx, int(BondType.SINGLE)))
                    continue
                d = pos[i] - pos[int(parent[i])]
                u = d / np.linalg.norm(d)
                gp = int(parent[int(parent[i])])
                ref_vec = pos[int(parent[i])] - pos[gp]
                nrm = np.linalg.norm(ref_vec)
                ref = ref_vec / nrm if nrm > 1e-6 else \
                    np.array([1.0, 0.0, 0.0])
                v, w = _frame(u, ref)
                for k in range(free):
                    h_idx = len(atom_type)
                    atom_type.append(1)
                    positions.append(
                        _rigid_place(pos[i], u, v, w, base + k, 1.09))
                    pairs.append((i, h_idx, int(BondType.SINGLE)))
            else:
                for _ in range(free):
                    h_idx = len(atom_type)
                    atom_type.append(1)
                    d = rng.normal(size=3)
                    d /= np.linalg.norm(d)
                    positions.append(pos[i] + d * 1.09)
                    pairs.append((i, h_idx, int(BondType.SINGLE)))

    n = len(atom_type)
    if rigid:
        # final deterministic all-atom de-clash (H arms can collide across
        # branches); every tree bond lists the child second, so bond
        # restoration walks child-ward
        allpos = np.asarray(positions, np.float64)
        lengths = [
            0.5 * (_BOND_LEN[int(atom_type[i])] + _BOND_LEN[int(atom_type[j])])
            if 1 not in (int(atom_type[i]), int(atom_type[j])) else 1.09
            for i, j, _ in pairs
        ]
        for _ in range(40):
            diff = allpos[:, None] - allpos[None, :]
            dist = np.linalg.norm(diff, axis=-1) + np.eye(n)
            force = np.where(dist[..., None] < 1.5,
                             diff / np.maximum(dist[..., None], 0.3) ** 3,
                             0.0)
            allpos += 0.03 * force.sum(axis=1)
            for (i, j, _), length in zip(pairs, lengths):
                v = allpos[j] - allpos[i]
                allpos[j] = allpos[i] + v / (np.linalg.norm(v) + 1e-9) * length
        positions = list(allpos)
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
    rigid: bool = False,
) -> List[Molecule]:
    rng = np.random.default_rng(seed)
    return [
        random_molecule(
            rng,
            num_heavy=int(rng.integers(min_heavy, max_heavy + 1)),
            num_conformers=num_conformers,
            rigid=rigid,
        )
        for _ in range(num_molecules)
    ]
