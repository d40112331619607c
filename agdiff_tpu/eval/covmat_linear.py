"""Serial COV/MAT evaluator variant with per-molecule diagnostics.

Reference: src/agdiff/utils/evaluation/covmat_rmsd_linear.py — a single-
process variant of the evaluator that additionally reports, per molecule:
SMILES, minimum RMSD, average best-N RMSD, and the raw confusion matrix,
with a `max_num_gen` cap on the generated conformers (applied AFTER the
ratio truncation, covmat_rmsd_linear.py:110-115).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from agdiff_tpu.chem.mol import Molecule
from agdiff_tpu.chem.rmsd import rmsd_confusion_matrix
from agdiff_tpu.eval.covmat import CovMatEvaluator, CovMatResults


@dataclass
class LinearCovMatResults(CovMatResults):
    smiles: List[Optional[str]] = None
    min_rmsd: np.ndarray = None          # (num_mols,)
    avg_best_n_rmsd: np.ndarray = None   # (num_mols,)
    confusion_matrices: List[np.ndarray] = None


class LinearCovMatEvaluator(CovMatEvaluator):
    """Single-process evaluator with per-molecule outputs."""

    def __init__(self, *args, top_n: int = 5, max_num_gen: int = 5, **kwargs):
        kwargs["num_workers"] = 1
        super().__init__(*args, **kwargs)
        self.top_n = top_n
        self.max_num_gen = max_num_gen

    def filter(self, packed_list: List[Molecule]) -> List[Molecule]:
        out = super().filter(packed_list)
        for mol in out:
            gens = mol.meta["pos_gen"]
            if gens.shape[0] > self.max_num_gen:
                mol.meta["pos_gen"] = gens[: self.max_num_gen]
        return out

    def __call__(self, packed_list: List[Molecule],
                 start_idx: int = 0) -> LinearCovMatResults:
        filtered = self.filter(packed_list)[start_idx:]
        self.print_fn(f"Filtered: {len(filtered)} / {len(packed_list)}")

        covr, matr, covp, matp = [], [], [], []
        smiles, min_rmsds, avg_best, mats = [], [], [], []
        for mol in filtered:
            n = mol.num_nodes
            cm = rmsd_confusion_matrix(
                mol, mol.pos_ref.reshape(-1, n, 3),
                np.asarray(mol.meta["pos_gen"]).reshape(-1, n, 3),
                max_maps=self.max_maps,
            )
            ref_sorted = np.sort(cm, axis=-1)
            gen_sorted = np.sort(cm, axis=0)
            ref_min = ref_sorted[:, 0]
            gen_min = gen_sorted[0, :]
            covr.append((ref_min[:, None] <= self.thresholds[None]).mean(0))
            covp.append((gen_min[:, None] <= self.thresholds[None]).mean(0))
            matr.append(ref_min.mean())
            matp.append(gen_min.mean())
            smiles.append(mol.smiles)
            min_rmsds.append(cm.min())
            avg_best.append(ref_sorted[:, : self.top_n].mean())
            mats.append(cm)

        return LinearCovMatResults(
            CoverageR=np.vstack(covr) if covr else np.zeros((0, len(self.thresholds))),
            MatchingR=np.array(matr),
            CoverageP=np.vstack(covp) if covp else np.zeros((0, len(self.thresholds))),
            MatchingP=np.array(matp),
            thresholds=self.thresholds,
            smiles=smiles,
            min_rmsd=np.array(min_rmsds),
            avg_best_n_rmsd=np.array(avg_best),
            confusion_matrices=mats,
        )
