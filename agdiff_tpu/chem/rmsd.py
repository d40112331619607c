"""Symmetry-aware best-RMSD (the COV/MAT metric kernel).

The reference computes RMSD via RDKit's C++ ``GetBestRMS`` on H-stripped
molecules (reference: src/agdiff/utils/chem.py:133-137), which minimizes the
aligned RMSD over graph automorphisms of the molecule. A pure Kabsch RMSD is
NOT equivalent (it ignores symmetry); this module provides the full
equivalent without RDKit:

  * Kabsch optimal-superposition RMSD (proper rotations only, via SVD with
    determinant correction);
  * molecular-graph automorphism enumeration (vertex colors = atomic number,
    edge colors = bond type) by iterated color refinement + backtracking;
  * best_rmsd = min over automorphisms of the aligned RMSD.

A native C++ implementation (native/rmsd.cpp, loaded via ctypes) accelerates
the hot confusion-matrix path; this numpy version is the reference
implementation and fallback.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from agdiff_tpu.chem.mol import Molecule


def kabsch_rmsd(ref: np.ndarray, gen: np.ndarray) -> float:
    """Minimum RMSD between two conformations over rigid-body motion
    (rotation + translation, no reflection)."""
    p = np.asarray(ref, np.float64)
    q = np.asarray(gen, np.float64)
    p = p - p.mean(axis=0)
    q = q - q.mean(axis=0)
    h = q.T @ p
    u, s, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(u @ vt))
    # E = sum|p|^2 + sum|q|^2 - 2 * trace(S * diag(1,1,d))
    e0 = (p * p).sum() + (q * q).sum()
    trace = s[0] + s[1] + d * s[2]
    msd = max(e0 - 2.0 * trace, 0.0) / p.shape[0]
    return float(np.sqrt(msd))


def _refine_colors(
    atom_labels: np.ndarray, adj_type: np.ndarray, iters: int = 10
) -> np.ndarray:
    """Weisfeiler-Leman color refinement; returns stable vertex colors."""
    n = len(atom_labels)
    colors = np.unique(atom_labels, return_inverse=True)[1]
    for _ in range(iters):
        sigs = []
        for i in range(n):
            nbr = sorted(
                (int(adj_type[i, j]), int(colors[j]))
                for j in range(n)
                if adj_type[i, j] > 0
            )
            sigs.append((int(colors[i]), tuple(nbr)))
        table = {s: k for k, s in enumerate(sorted(set(sigs)))}
        new = np.array([table[s] for s in sigs])
        if (new == colors).all():
            break
        colors = new
    return colors


def graph_automorphisms(
    atom_labels: np.ndarray,
    adj_type: np.ndarray,
    max_maps: int = 10000,
) -> Iterator[np.ndarray]:
    """Enumerate automorphisms of a vertex/edge-labeled graph (backtracking
    over refinement-compatible candidates). Yields permutations p with
    p[i] = image of vertex i. Caps at max_maps mappings."""
    n = len(atom_labels)
    colors = _refine_colors(atom_labels, adj_type)
    # order vertices by ascending candidate-set size for fast pruning
    order = sorted(range(n), key=lambda i: (colors == colors[i]).sum())
    mapping = -np.ones(n, np.int64)
    used = np.zeros(n, bool)
    count = 0

    def backtrack(depth: int):
        nonlocal count
        if count >= max_maps:
            return
        if depth == n:
            count += 1
            yield mapping.copy()
            return
        v = order[depth]
        for w in range(n):
            if used[w] or colors[w] != colors[v]:
                continue
            ok = True
            for u in order[:depth]:  # check edges to already-mapped vertices
                if adj_type[v, u] != adj_type[w, mapping[u]]:
                    ok = False
                    break
            if not ok:
                continue
            mapping[v] = w
            used[w] = True
            yield from backtrack(depth + 1)
            used[w] = False
            mapping[v] = -1

    yield from backtrack(0)


def best_rmsd(
    mol: Molecule,
    pos_ref: np.ndarray,
    pos_gen: np.ndarray,
    strip_hydrogens: bool = True,
    max_maps: int = 10000,
) -> float:
    """Symmetry-aware minimum RMSD between a reference and generated
    conformation of `mol` (equivalent of reference get_best_rmsd,
    chem.py:133-137: RemoveHs + GetBestRMS)."""
    pos_ref = np.asarray(pos_ref, np.float64).reshape(-1, 3)
    pos_gen = np.asarray(pos_gen, np.float64).reshape(-1, 3)
    if strip_hydrogens:
        keep = mol.atom_type != 1
        heavy = mol.heavy_atom_subset()
        labels = heavy.atom_type
        adj = heavy.bond_adjacency()
        pos_ref = pos_ref[keep]
        pos_gen = pos_gen[keep]
    else:
        labels = mol.atom_type
        adj = mol.bond_adjacency()

    best = np.inf
    for perm in graph_automorphisms(labels, adj, max_maps=max_maps):
        # permute the generated (probe) conformation onto the reference
        r = kabsch_rmsd(pos_ref, pos_gen[perm])
        if r < best:
            best = r
    return float(best)


def rmsd_confusion_matrix(
    mol: Molecule,
    pos_refs: np.ndarray,  # (num_ref, N, 3)
    pos_gens: np.ndarray,  # (num_gen, N, 3)
    strip_hydrogens: bool = True,
    max_maps: int = 10000,
    use_native: bool = True,
) -> np.ndarray:
    """(num_ref, num_gen) best-RMSD matrix (reference: covmat.py:16-34)."""
    if use_native:
        try:
            from agdiff_tpu.chem import native_rmsd

            return native_rmsd.rmsd_confusion_matrix(
                mol, pos_refs, pos_gens, strip_hydrogens=strip_hydrogens,
                max_maps=max_maps,
            )
        except Exception:
            pass  # fall back to numpy
    num_ref, num_gen = len(pos_refs), len(pos_gens)
    out = -np.ones((num_ref, num_gen))
    # enumerate automorphisms once, reuse for every pair
    if strip_hydrogens:
        keep = mol.atom_type != 1
        heavy = mol.heavy_atom_subset()
        labels, adj = heavy.atom_type, heavy.bond_adjacency()
    else:
        keep = np.ones(mol.num_nodes, bool)
        labels, adj = mol.atom_type, mol.bond_adjacency()
    perms = list(graph_automorphisms(labels, adj, max_maps=max_maps))
    refs = np.asarray(pos_refs, np.float64)[:, keep]
    gens = np.asarray(pos_gens, np.float64)[:, keep]
    for j in range(num_gen):
        permuted = [gens[j][p] for p in perms]
        for i in range(num_ref):
            out[i, j] = min(kabsch_rmsd(refs[i], g) for g in permuted)
    return out
