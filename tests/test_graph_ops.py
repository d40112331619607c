"""Unit tests for graph construction and geometry ops against hand-computed
and brute-force goldens (mirrors reference semantics: common.py:135-264,
geometry.py:5-17)."""

import numpy as np
import pytest

import jax.numpy as jnp

from agdiff_tpu.chem.constants import NUM_BOND_TYPES, BondType
from agdiff_tpu.data.transforms import extend_bond_order
from agdiff_tpu.ops.geometry import (
    center_pos,
    clip_norm,
    eq_transform_dense,
    pairwise_distance,
)
from agdiff_tpu.ops.graph import extend_graph_order_dense, radius_union_mask


def chain_adj(n, bond_type=int(BondType.SINGLE)):
    adj = np.zeros((n, n), np.int32)
    for i in range(n - 1):
        adj[i, i + 1] = adj[i + 1, i] = bond_type
    return adj


class TestExtendBondOrder:
    def test_chain_hops(self):
        # 0-1-2-3-4 chain: 1-hop keeps type, 2-hop type 23, 3-hop type 24
        adj = chain_adj(5)
        ext = extend_bond_order(adj, order=3)
        assert ext[0, 1] == BondType.SINGLE
        assert ext[0, 2] == NUM_BOND_TYPES + 1  # 23
        assert ext[0, 3] == NUM_BOND_TYPES + 2  # 24
        assert ext[0, 4] == 0  # 4 hops away — not added
        assert (ext == ext.T).all()
        assert (np.diag(ext) == 0).all()

    def test_preserves_bond_types(self):
        adj = chain_adj(4, bond_type=int(BondType.AROMATIC))
        ext = extend_bond_order(adj, order=3)
        assert ext[1, 2] == BondType.AROMATIC

    def test_dense_jax_matches_numpy(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            n = 8
            adj = np.zeros((n, n), np.int32)
            for _ in range(10):
                i, j = rng.integers(0, n, 2)
                if i != j:
                    t = int(rng.integers(1, 4))
                    adj[i, j] = adj[j, i] = t
            golden = extend_bond_order(adj, order=3)
            got = np.asarray(extend_graph_order_dense(jnp.asarray(adj[None]), 3))[0]
            np.testing.assert_array_equal(got, golden)


class TestRadiusUnion:
    def test_radius_and_bond_union(self):
        # two atoms bonded but far apart + two atoms close but unbonded
        pos = np.array([[[0, 0, 0], [5, 0, 0], [0, 1, 0], [20, 0, 0]]], np.float32)
        bond = np.zeros((1, 4, 4), np.int32)
        bond[0, 0, 1] = bond[0, 1, 0] = 1
        node_mask = np.ones((1, 4), bool)
        dist = pairwise_distance(jnp.asarray(pos))
        edge_mask, edge_type, local_mask = radius_union_mask(
            dist, jnp.asarray(bond), jnp.asarray(node_mask), cutoff=3.0
        )
        edge_mask = np.asarray(edge_mask)
        edge_type = np.asarray(edge_type)
        assert edge_mask[0, 0, 1] and edge_type[0, 0, 1] == 1  # bond kept (far)
        assert edge_mask[0, 0, 2] and edge_type[0, 0, 2] == 0  # radius edge
        assert not edge_mask[0, 0, 3]  # too far, no bond
        assert not edge_mask[0, 0, 0]  # no self loops
        assert np.asarray(local_mask)[0, 0, 1]
        assert not np.asarray(local_mask)[0, 0, 2]

    def test_padding_masked(self):
        pos = np.zeros((1, 4, 3), np.float32)  # all at origin => all within cutoff
        node_mask = np.array([[True, True, False, False]])
        dist = pairwise_distance(jnp.asarray(pos))
        edge_mask, _, _ = radius_union_mask(
            dist, jnp.zeros((1, 4, 4), jnp.int32), jnp.asarray(node_mask), 10.0
        )
        edge_mask = np.asarray(edge_mask)
        assert edge_mask[0, 0, 1]
        assert not edge_mask[0, 0, 2] and not edge_mask[0, 2, 3]


class TestGeometry:
    def test_pairwise_distance(self, rng):
        pos = rng.normal(size=(2, 6, 3)).astype(np.float32)
        d = np.asarray(pairwise_distance(jnp.asarray(pos)))
        golden = np.linalg.norm(pos[:, :, None] - pos[:, None, :], axis=-1)
        np.testing.assert_allclose(d, golden, atol=1e-5)

    def test_eq_transform_matches_scatter_golden(self, rng):
        """Dense eq_transform == reference edge-list scatter formula."""
        b, n = 2, 7
        pos = rng.normal(size=(b, n, 3)).astype(np.float32)
        mask = rng.random((b, n, n)) < 0.4
        mask &= ~np.eye(n, dtype=bool)[None]
        mask = mask | mask.transpose(0, 2, 1)  # symmetric edge set
        score = rng.normal(size=(b, n, n)).astype(np.float32)
        dist = np.linalg.norm(pos[:, :, None] - pos[:, None, :], axis=-1)
        dist = np.maximum(dist, 1e-12)

        golden = np.zeros((b, n, 3))
        for g in range(b):
            for i in range(n):
                for j in range(n):
                    if mask[g, i, j]:
                        dd_dr = (pos[g, i] - pos[g, j]) / dist[g, i, j]
                        golden[g, i] += dd_dr * score[g, i, j]   # source +
                        golden[g, j] += -dd_dr * score[g, i, j]  # target -
        got = np.asarray(
            eq_transform_dense(
                jnp.asarray(score), jnp.asarray(pos), jnp.asarray(mask),
                jnp.asarray(dist),
            )
        )
        np.testing.assert_allclose(got, golden, atol=1e-4)

    def test_center_pos(self, rng):
        pos = rng.normal(size=(2, 5, 3)).astype(np.float32)
        mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], bool)
        out = np.asarray(center_pos(jnp.asarray(pos), jnp.asarray(mask)))
        for g in range(2):
            com = out[g][mask[g]].mean(axis=0)
            np.testing.assert_allclose(com, 0.0, atol=1e-6)
        np.testing.assert_allclose(out[0, 3:], 0.0)  # padding zeroed

    def test_clip_norm(self):
        v = jnp.array([[3.0, 4.0, 0.0], [0.1, 0.0, 0.0]])
        out = np.asarray(clip_norm(v, 1.0))
        np.testing.assert_allclose(np.linalg.norm(out[0]), 1.0, rtol=1e-6)
        np.testing.assert_allclose(out[1], [0.1, 0, 0])


class TestSchedule:
    def test_sigmoid_schedule_matches_reference_formula(self):
        from agdiff_tpu.models.schedules import get_beta_schedule, make_diffusion
        from agdiff_tpu.config import ModelConfig

        betas = get_beta_schedule(
            "sigmoid", beta_start=1e-7, beta_end=2e-3,
            num_diffusion_timesteps=5000,
        )
        x = np.linspace(-6, 6, 5000)
        golden = 1 / (np.exp(-x) + 1) * (2e-3 - 1e-7) + 1e-7
        np.testing.assert_allclose(betas, golden, rtol=1e-12)

        diff = make_diffusion(ModelConfig())
        assert diff.num_timesteps == 5000
        assert diff.alphas[0] == np.float32(1.0 - betas[0])
        assert (np.diff(diff.alphas) <= 0).all()
        assert (diff.sigmas > 0).all()

    def test_all_schedules(self):
        from agdiff_tpu.models.schedules import get_beta_schedule

        for name in ["quad", "linear", "const", "jsd", "sigmoid"]:
            betas = get_beta_schedule(
                name, beta_start=1e-5, beta_end=1e-2, num_diffusion_timesteps=50
            )
            assert betas.shape == (50,)
            assert (betas > 0).all()

    def test_dsm_ladder(self):
        from agdiff_tpu.config import ModelConfig
        from agdiff_tpu.models.schedules import make_diffusion

        diff = make_diffusion(ModelConfig(type="dsm"))
        assert diff.num_timesteps == 50
        np.testing.assert_allclose(diff.sigmas[0], 10.0, rtol=1e-3)
        np.testing.assert_allclose(diff.sigmas[-1], 0.01, rtol=1e-3)
