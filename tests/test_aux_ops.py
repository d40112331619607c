"""Aux op tests: internal coordinates, readouts, coarse graining, aux
transforms (reference: geometry.py:20-70, common.py:12-41/267-313,
transforms.py:74-186)."""

import numpy as np
import pytest

import jax.numpy as jnp

from agdiff_tpu.data.synthetic import synthetic_dataset
from agdiff_tpu.ops.geometry import get_angle, get_dihedral
from agdiff_tpu.ops.masked import (
    coarse_grain,
    complete_graph_mask,
    mean_readout,
    sum_readout,
)


class TestInternalCoordinates:
    def test_right_angle(self):
        pos = jnp.array([[1.0, 0, 0], [0, 0, 0], [0, 1.0, 0]])
        angle = get_angle(pos, jnp.array([[0], [1], [2]]))
        np.testing.assert_allclose(float(angle[0, 0]), np.pi / 2, atol=1e-6)

    def test_straight_angle(self):
        pos = jnp.array([[1.0, 0, 0], [0, 0, 0], [-1.0, 0, 0]])
        angle = get_angle(pos, jnp.array([[0], [1], [2]]))
        np.testing.assert_allclose(float(angle[0, 0]), np.pi, atol=1e-5)

    def test_dihedral_90(self):
        # four atoms: the two planes around the central bond differ by 90 deg
        pos = jnp.array([
            [1.0, 0, 0], [0, 0, 0], [0, 0, 1.0], [0, 1.0, 1.0],
        ])
        d = get_dihedral(pos, jnp.array([[0], [1], [2], [3]]))
        np.testing.assert_allclose(float(d[0, 0]), np.pi / 2, atol=1e-5)


class TestReadouts:
    def test_masked_readouts(self, rng):
        x = rng.normal(size=(2, 5, 4)).astype(np.float32)
        mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], bool)
        mean = np.asarray(mean_readout(jnp.asarray(x), jnp.asarray(mask)))
        summ = np.asarray(sum_readout(jnp.asarray(x), jnp.asarray(mask)))
        np.testing.assert_allclose(mean[0], x[0, :3].mean(0), atol=1e-6)
        np.testing.assert_allclose(summ[0], x[0, :3].sum(0), atol=1e-5)
        np.testing.assert_allclose(mean[1], x[1].mean(0), atol=1e-6)

    def test_coarse_grain(self, rng):
        pos = rng.normal(size=(1, 4, 3)).astype(np.float32)
        attr = rng.normal(size=(1, 4, 2)).astype(np.float32)
        onehot = np.zeros((1, 4, 2), np.float32)
        onehot[0, :2, 0] = 1  # cluster 0 = atoms 0,1
        onehot[0, 2:, 1] = 1  # cluster 1 = atoms 2,3
        mask = np.ones((1, 4), bool)
        cpos, cattr, cmask = coarse_grain(
            jnp.asarray(pos), jnp.asarray(attr), jnp.asarray(onehot),
            jnp.asarray(mask),
        )
        np.testing.assert_allclose(
            np.asarray(cpos)[0, 0], pos[0, :2].mean(0), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(cattr)[0, 1], attr[0, 2:].sum(0), atol=1e-6
        )
        assert np.asarray(cmask).all()

    def test_complete_graph(self):
        mask = jnp.array([[True, True, True, False]])
        cg = np.asarray(complete_graph_mask(mask))
        assert cg.sum() == 6  # 3 * 2 directed pairs
        assert not cg[0].diagonal().any()


class TestAngleDihedralTransform:
    def test_counts_against_bruteforce(self):
        from agdiff_tpu.data.transforms import add_angle_dihedral

        mol = synthetic_dataset(1, seed=3, min_heavy=4, max_heavy=4)[0]
        add_angle_dihedral(mol)
        adj = mol.bond_adjacency() > 0
        n = mol.num_nodes
        angles = mol.meta["angle_index"]
        # every angle triplet is bonded j-k and k-l with j < l
        for j, k, l in angles.T:
            assert adj[j, k] and adj[k, l] and j < l
        # angle value computable
        if angles.shape[1]:
            a = get_angle(jnp.asarray(mol.pos), jnp.asarray(angles))
            assert np.isfinite(np.asarray(a)).all()
