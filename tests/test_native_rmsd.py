"""Native C++ RMSD kernel vs the pure-numpy reference implementation."""

import numpy as np
import pytest

from agdiff_tpu.chem import rmsd as pyrmsd
from agdiff_tpu.data.synthetic import synthetic_dataset

native_rmsd = pytest.importorskip("agdiff_tpu.chem.native_rmsd")

try:
    native_rmsd.get_lib()
    HAS_NATIVE = True
except Exception:
    HAS_NATIVE = False

pytestmark = pytest.mark.skipif(not HAS_NATIVE, reason="no C++ toolchain")


class TestNativeKernel:
    def test_automorphism_counts_match(self):
        for seed in range(5):
            mol = synthetic_dataset(1, seed=seed, min_heavy=4, max_heavy=7)[0]
            heavy = mol.heavy_atom_subset()
            py = {
                tuple(p)
                for p in pyrmsd.graph_automorphisms(
                    heavy.atom_type, heavy.bond_adjacency()
                )
            }
            cc = {
                tuple(p)
                for p in native_rmsd.enumerate_automorphisms(
                    heavy.atom_type, heavy.bond_adjacency()
                )
            }
            assert py == cc

    def test_confusion_matrix_matches_numpy(self):
        rng = np.random.default_rng(0)
        mol = synthetic_dataset(1, seed=3, min_heavy=5, max_heavy=6)[0]
        n = mol.num_nodes
        refs = mol.pos[None] + rng.normal(scale=0.2, size=(3, n, 3))
        gens = mol.pos[None] + rng.normal(scale=0.3, size=(5, n, 3))
        golden = pyrmsd.rmsd_confusion_matrix(
            mol, refs, gens, use_native=False
        )
        got = native_rmsd.rmsd_confusion_matrix(mol, refs, gens)
        np.testing.assert_allclose(got, golden, atol=1e-8)

    def test_exact_zero_on_self(self):
        mol = synthetic_dataset(1, seed=1, min_heavy=5, max_heavy=5)[0]
        r = native_rmsd.best_rmsd(mol, mol.pos, mol.pos)
        assert r < 1e-7

    def test_symmetry_awareness(self):
        """Permuting symmetric atoms yields ~0 best-RMSD natively too."""
        from agdiff_tpu.chem.constants import BondType
        from agdiff_tpu.chem.mol import Molecule

        s = int(BondType.SINGLE)
        mol = Molecule(
            atom_type=[6, 9, 9],
            pos=[[0, 0, 0], [1.4, 0, 0], [0, 2.2, 0]],
            bond_index=[[0, 1, 0, 2], [1, 0, 2, 0]],
            bond_type=[s, s, s, s],
        )
        ref = np.array(mol.pos, float)
        gen = ref[[0, 2, 1]]
        assert native_rmsd.best_rmsd(mol, ref, gen) < 1e-7

    def test_rotation_invariance(self):
        rng = np.random.default_rng(2)
        mol = synthetic_dataset(1, seed=5, min_heavy=6, max_heavy=6)[0]
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        gen = mol.pos @ q + rng.normal(size=3)
        assert native_rmsd.best_rmsd(mol, mol.pos, gen) < 1e-6

    def test_throughput_beats_numpy(self):
        """The native kernel should be much faster on a realistic matrix."""
        import time

        rng = np.random.default_rng(0)
        mol = synthetic_dataset(1, seed=7, min_heavy=8, max_heavy=8)[0]
        n = mol.num_nodes
        refs = mol.pos[None] + rng.normal(scale=0.2, size=(10, n, 3))
        gens = mol.pos[None] + rng.normal(scale=0.3, size=(20, n, 3))
        t0 = time.perf_counter()
        native_rmsd.rmsd_confusion_matrix(mol, refs, gens)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        pyrmsd.rmsd_confusion_matrix(mol, refs, gens, use_native=False)
        t_numpy = time.perf_counter() - t0
        assert t_native < t_numpy  # typically 50-500x faster
