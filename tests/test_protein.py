"""Protein subgraph machinery + eval variants + PDB IO tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def structure():
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from alanine_dipeptide import build_alanine_dipeptide

    from agdiff_tpu.chem.pdb import parse_pdb, write_pdb

    mol = build_alanine_dipeptide()
    # round-trip through PDB to get annotations
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/x.pdb"
        # give atoms residue-ish names so annotations are meaningful
        names = np.array(
            ["CH3", "H1", "H2", "H3", "C", "O", "N", "H", "CA", "HA",
             "CB", "HB1", "HB2", "HB3", "C", "O", "N", "H", "CH3", "H1",
             "H2", "H3"])
        res_ids = np.array([1] * 6 + [2] * 10 + [3] * 6, np.int32)
        res_names = np.array(["ACE"] * 6 + ["ALA"] * 10 + ["NME"] * 6)
        ann = {"atom_name": names, "res_name": res_names, "res_id": res_ids}
        write_pdb(path, mol, mol.pos, annotations=ann)
        mol2, ann2 = parse_pdb(open(path).read())
    return mol2, ann2


class TestPDBRoundtrip:
    def test_annotations(self, structure):
        mol, ann = structure
        assert mol.num_nodes == 22
        assert (ann["res_id"] == [1] * 6 + [2] * 10 + [3] * 6).all()
        assert ann["is_backbone"].sum() == 7  # C,O (ACE) + N,CA,C,O (ALA) + N (NME)
        assert ann["is_alpha"].sum() == 1


class TestSidechainSubgraph:
    def test_subgraph_residue_complete(self, structure):
        from agdiff_tpu.data.protein import sample_sidechain_subgraph

        mol, ann = structure
        sub = sample_sidechain_subgraph(
            mol, ann, cutoff=3.0, rng=np.random.default_rng(0)
        )
        assert sub is not None
        # residues are complete: every res_id present has all its atoms
        sub_res = sub.meta["res_id"]
        for r in np.unique(sub_res):
            assert (sub_res == r).sum() == (ann["res_id"] == r).sum()
        # bonds reindexed validly
        assert sub.bond_index.max() < sub.num_nodes

    def test_dataset_collate_drops_none(self, structure):
        from agdiff_tpu.data.protein import SidechainConformationDataset

        ds = SidechainConformationDataset([structure], cutoff=3.0, seed=1)
        items = [ds[0] for _ in range(3)] + [None]
        assert len(ds.collate(items)) == 3

    def test_subgraph_scores_cover_structure(self, structure):
        from agdiff_tpu.data.protein import subgraph_position_scores

        mol, ann = structure

        def fake_score(batch):
            return np.ones(batch.pos.shape, np.float32)

        scores = subgraph_position_scores(
            mol, ann, fake_score, max_nodes=32, cutoff=6.0
        )
        assert scores.shape == (22, 3)
        assert (np.abs(scores) > 0).any()
