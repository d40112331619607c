"""Ensemble-property evaluation (energy / HOMO / LUMO / dipole moment).

Reference: scripts/evaluation/eval_prop.py — computes QM properties for up
to num_confs conformers per molecule via psi4 (through psikit), then
compares generated-vs-reference ensemble statistics in eV:
  average energy, lowest energy, HOMO-LUMO gap statistics (mean/min/max),
  reported as |gen - ref| MAE over molecules.

psi4/psikit are host-side quantum-chemistry dependencies and are optional
here exactly as RDKit is: the calculator raises a clear ImportError if they
are absent. The ensemble-statistics math below is dependency-free.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from agdiff_tpu.chem.mol import Molecule

HARTREE_TO_EV = 27.211386245988


class PropertyCalculator:
    """Per-conformer QM properties via psikit/psi4 (reference:
    eval_prop.py:17-56)."""

    def __init__(self, threads: int = 8, memory: int = 16, seed: int = 2021):
        try:
            from psikit import Psikit
        except ImportError as e:
            raise ImportError(
                "psikit/psi4 are required for property evaluation "
                "(optional extra); COV/MAT evaluation does not need them."
            ) from e
        from agdiff_tpu.chem.rdkit_bridge import molecule_to_rdmol  # noqa: F401

        self.pk = Psikit(threads=threads, memory=memory)
        self.seed = seed

    def __call__(self, mol: Molecule, conformers: np.ndarray,
                 num_confs: int = 50) -> Dict[str, List[float]]:
        from agdiff_tpu.chem.rdkit_bridge import molecule_to_rdmol

        confs = np.asarray(conformers).reshape(-1, mol.num_nodes, 3)
        idx = np.arange(confs.shape[0])
        np.random.RandomState(self.seed).shuffle(idx)
        out = {"conf_idx": [], "energy": [], "homo": [], "lumo": [],
               "dipole": []}
        for k in idx[:num_confs]:
            self.pk.mol = molecule_to_rdmol(mol, confs[k])
            try:
                out["energy"].append(float(self.pk.energy()))
                out["homo"].append(float(self.pk.HOMO))
                out["lumo"].append(float(self.pk.LUMO))
                out["dipole"].append(float(self.pk.dipolemoment[-1]))
                out["conf_idx"].append(int(k))
            except Exception:
                continue
        return out


def ensemble_statistics(props: Dict[str, List[float]]) -> Dict[str, float]:
    """Reference eval_prop.py get_ensemble_energy: statistics in eV."""
    energy = np.array(props["energy"]) * HARTREE_TO_EV
    # reference uses |homo - lumo| (eval_prop.py:81)
    gap = np.abs(np.array(props["lumo"]) - np.array(props["homo"])) \
        * HARTREE_TO_EV
    return {
        "avg_energy": float(energy.mean()),
        "low_energy": float(energy.min()),
        "avg_gap": float(gap.mean()),
        "min_gap": float(gap.min()),
        "max_gap": float(gap.max()),
    }


def compare_ensembles(gen_props, ref_props) -> Dict[str, float]:
    """|gen - ref| per ensemble statistic (the per-molecule term of the
    reference's MAE report)."""
    g = ensemble_statistics(gen_props)
    r = ensemble_statistics(ref_props)
    return {k: abs(g[k] - r[k]) for k in g}
