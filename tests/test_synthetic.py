"""Synthetic molecule generator invariants (tree, rigid, and rich modes)."""

import numpy as np
import pytest

from agdiff_tpu.chem.constants import BondType
from agdiff_tpu.data.synthetic import synthetic_dataset

_ORDER = {
    int(BondType.SINGLE): 1.0,
    int(BondType.DOUBLE): 2.0,
    int(BondType.TRIPLE): 3.0,
    int(BondType.AROMATIC): 1.5,
}
_VALENCE = {1: 1, 6: 4, 7: 3, 8: 2, 9: 1, 16: 2, 17: 1}


@pytest.mark.parametrize("rigid", [False, True])
def test_generator_invariants(rigid):
    mols = synthetic_dataset(30, seed=0, rigid=rigid, num_conformers=2)
    for m in mols:
        p = m.pos
        assert np.isfinite(p).all()
        n = len(m.atom_type)
        # tree + H: exactly n-1 undirected bonds, both directions listed
        assert m.bond_index.shape[1] == 2 * (n - 1)
        # centered
        assert np.abs(p.mean(0)).max() < 1e-4
        # bond lengths in chemically plausible range
        d = np.linalg.norm(p[m.bond_index[0]] - p[m.bond_index[1]], axis=-1)
        assert d.min() > 0.9 and d.max() < 1.7
        assert m.pos_ref.shape == (2 * n, 3)


def test_rigid_is_deterministic_and_declashed():
    a = synthetic_dataset(5, seed=9, rigid=True)
    b = synthetic_dataset(5, seed=9, rigid=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.pos, y.pos)
        np.testing.assert_array_equal(x.bond_index, y.bond_index)
    worst = 9e9
    for m in synthetic_dataset(60, seed=1, rigid=True):
        d = np.linalg.norm(m.pos[:, None] - m.pos[None, :], axis=-1)
        np.fill_diagonal(d, 9e9)
        for i, j in m.bond_index.T:
            d[i, j] = 9e9
        worst = min(worst, d.min())
    assert worst > 0.6  # non-bonded atoms never collapse onto each other


def test_rich_valence_exact_and_connected():
    """Every atom's bond-order sum equals its element valence; one component."""
    mols = synthetic_dataset(40, seed=3, chem="rich",
                             min_heavy=5, max_heavy=16, num_conformers=2)
    for m in mols:
        n = len(m.atom_type)
        used = np.zeros(n)
        for (i, j), t in zip(m.bond_index.T, m.bond_type):
            used[i] += _ORDER[int(t)]
        # directed list: each undirected bond contributes once per endpoint
        for a in range(n):
            z = int(m.atom_type[a])
            assert abs(used[a] - _VALENCE[z]) < 1e-6, (m.smiles, a, z, used[a])
        # connectivity via BFS over the bond graph
        seen = {0}
        queue = [0]
        adj = [[] for _ in range(n)]
        for i, j in m.bond_index.T:
            adj[i].append(int(j))
        while queue:
            for j in adj[queue.pop()]:
                if j not in seen:
                    seen.add(j)
                    queue.append(j)
        assert len(seen) == n
        assert m.pos_ref.shape == (2 * n, 3)


def test_rich_ring_closure_and_vocabulary():
    """Cycle rank matches the planned rings; the full bond vocab appears."""
    mols = synthetic_dataset(60, seed=5, chem="rich",
                             min_heavy=6, max_heavy=18)
    seen_types = set()
    any_ring = False
    for m in mols:
        n = len(m.atom_type)
        e_undirected = m.bond_index.shape[1] // 2
        cycles = e_undirected - n + 1  # connected => cycle rank
        assert cycles == len(m.meta["ring_sizes"])
        if cycles:
            any_ring = True
            assert all(3 <= s <= 6 for s in m.meta["ring_sizes"])
        seen_types.update(int(t) for t in m.bond_type)
    assert any_ring
    assert {int(BondType.SINGLE), int(BondType.DOUBLE),
            int(BondType.AROMATIC)} <= seen_types


def test_rich_geometry_sane():
    """Bond lengths near their type-dependent targets; no atom collisions."""
    for m in synthetic_dataset(30, seed=7, chem="rich",
                               min_heavy=5, max_heavy=16):
        p = m.pos
        assert np.isfinite(p).all()
        assert np.abs(p.mean(0)).max() < 1e-3
        d = np.linalg.norm(p[m.bond_index[0]] - p[m.bond_index[1]], axis=-1)
        assert d.min() > 0.8 and d.max() < 2.6
        n = len(m.atom_type)
        full = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
        np.fill_diagonal(full, 9e9)
        full[m.bond_index[0], m.bond_index[1]] = 9e9
        assert full.min() > 0.7


def test_rich_deterministic_and_validated():
    a = synthetic_dataset(5, seed=11, chem="rich")
    b = synthetic_dataset(5, seed=11, chem="rich")
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.pos, y.pos)
        np.testing.assert_array_equal(x.bond_type, y.bond_type)
    with pytest.raises(ValueError):
        synthetic_dataset(1, chem="nope")
    with pytest.raises(ValueError):
        synthetic_dataset(1, chem="rich", rigid=True)


@pytest.mark.parametrize("chem", ["tree", "rich"])
def test_torsion_conformer_preserves_local_geometry(chem):
    """Torsion conformers keep every bond length, angle-pair distance, and
    ring's internal geometry exactly (rotations are rigid per side; the
    declash relax projects bonds/angles back), while genuinely changing
    the shape (dihedrals)."""
    from agdiff_tpu.data.synthetic import _bridges, torsion_conformer

    mols = synthetic_dataset(6, seed=3, chem=chem)
    any_diverse = False
    for m in mols:
        rng = np.random.default_rng(0)
        r1 = torsion_conformer(m, rng, jitter=0.0)
        r2 = torsion_conformer(m, rng, jitter=0.0)
        bi = m.bond_index
        u = bi[0] < bi[1]
        i, j = bi[0][u], bi[1][u]
        d0 = np.linalg.norm(m.pos[i] - m.pos[j], axis=-1)
        for r in (r1, r2):
            assert r.shape == m.pos.shape
            assert np.isfinite(r).all()
            dr = np.linalg.norm(r[i] - r[j], axis=-1)
            np.testing.assert_allclose(dr, d0, atol=5e-3)
            # centered output
            np.testing.assert_allclose(r.mean(0), 0.0, atol=1e-4)
        # intra-ring pairwise distances rigid (rings are never rotated)
        edges = list(zip(bi[0][u].tolist(), bi[1][u].tolist()))
        br = _bridges(m.num_nodes, edges)
        ring_atoms = sorted({a for e, (x, y) in enumerate(edges)
                             if e not in br for a in (x, y)})
        if len(ring_atoms) >= 3:
            ra = np.array(ring_atoms)
            dn = np.linalg.norm(r1[ra][:, None] - r1[ra][None], axis=-1)
            do = np.linalg.norm(m.pos[ra][:, None] - m.pos[ra][None],
                                axis=-1)
            np.testing.assert_allclose(dn, do, atol=2e-2)
        # two draws of a molecule with a rotatable bond differ substantially
        rmsd = float(np.sqrt(((r1 - r2) ** 2).sum(-1).mean()))
        if rmsd > 0.3:
            any_diverse = True
    assert any_diverse


def test_multiref_dataset_and_expansion():
    from agdiff_tpu.data.synthetic import expand_conformers

    mols = synthetic_dataset(4, seed=5, num_conformers=3, chem="rich",
                             multiref=True)
    for m in mols:
        refs = m.pos_ref.reshape(-1, m.num_nodes, 3)
        assert refs.shape[0] == 3
        # distinct torsional modes, not jitters: pairwise RMSD across refs
        # is far above the 0.15 thermal jitter for at least one pair
        d01 = np.sqrt(((refs[0] - refs[1]) ** 2).sum(-1).mean())
        d02 = np.sqrt(((refs[0] - refs[2]) ** 2).sum(-1).mean())
        assert np.isfinite([d01, d02]).all()
    # legacy default (multiref off) is byte-stable and jitter-like
    a = synthetic_dataset(3, seed=11, num_conformers=2)
    b = synthetic_dataset(3, seed=11, num_conformers=2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.pos_ref, y.pos_ref)

    ex = expand_conformers(mols, 3, seed=9)
    assert len(ex) == 3 * len(mols)
    assert ex[0] is mols[0]
    assert np.array_equal(ex[1].atom_type, mols[0].atom_type)
    assert np.array_equal(ex[1].bond_index, mols[0].bond_index)
    assert ex[1].smiles == mols[0].smiles
    assert not np.array_equal(ex[1].pos, mols[0].pos)
