"""Synthetic molecule generator invariants (both geometry modes)."""

import numpy as np
import pytest

from agdiff_tpu.data.synthetic import synthetic_dataset


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
