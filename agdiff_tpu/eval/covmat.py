"""COV/MAT evaluation (coverage / matching over best-RMSD).

Reference: src/agdiff/utils/evaluation/covmat.py. Kept semantics:
  * per molecule, an (num_ref, num_gen) best-RMSD confusion matrix using
    symmetry-aware heavy-atom RMSD (here: chem.rmsd / the native C++ kernel
    instead of RDKit GetBestRMS);
  * filters: needs pos_gen and pos_ref; drops disconnected smiles
    ("." in smiles, covmat.py:104); requires >= ratio * num_ref generated
    conformers and truncates to exactly that many (covmat.py:114-117);
  * COV-R(t) = fraction of refs with min-over-gens RMSD <= t;
    COV-P(t) = fraction of gens with min-over-refs RMSD <= t;
    MAT-R / MAT-P = mean of those minima; thresholds 0.05..3.0 step 0.05;
  * parallel over molecules with a process pool (num_workers=8);
  * optional force-field relaxation of generated conformers (useFF) —
    requires RDKit here, as in the reference (MMFFOptimizeMolecule).
"""

from __future__ import annotations

import multiprocessing as mp
from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import numpy as np

from agdiff_tpu.chem.mol import Molecule
from agdiff_tpu.chem.rmsd import rmsd_confusion_matrix


def _confusion_for(packed: Molecule, use_ff: bool, max_maps: int) -> np.ndarray:
    n = packed.num_nodes
    refs = packed.pos_ref.reshape(-1, n, 3)
    gens = packed.meta["pos_gen"].reshape(-1, n, 3)
    if use_ff:
        from agdiff_tpu.chem.rdkit_bridge import mmff_optimize_positions

        gens = np.stack([mmff_optimize_positions(packed, g) for g in gens])
    return rmsd_confusion_matrix(packed, refs, gens, max_maps=max_maps)


@dataclass
class CovMatResults:
    CoverageR: np.ndarray   # (num_mols, num_thresholds)
    MatchingR: np.ndarray   # (num_mols,)
    CoverageP: np.ndarray
    MatchingP: np.ndarray
    thresholds: np.ndarray


class CovMatEvaluator:
    def __init__(
        self,
        num_workers: int = 8,
        use_force_field: bool = False,
        thresholds: Optional[np.ndarray] = None,
        ratio: int = 2,
        filter_disconnected: bool = True,
        max_maps: int = 10000,
        print_fn=print,
    ):
        self.num_workers = num_workers
        self.use_force_field = use_force_field
        self.thresholds = (
            np.arange(0.05, 3.05, 0.05) if thresholds is None
            else np.asarray(thresholds).flatten()
        )
        self.ratio = ratio
        self.filter_disconnected = filter_disconnected
        self.max_maps = max_maps
        self.print_fn = print_fn

    def filter(self, packed_list: List[Molecule]) -> List[Molecule]:
        out = []
        for mol in packed_list:
            if mol.pos_ref is None or "pos_gen" not in mol.meta:
                continue
            if self.filter_disconnected and mol.smiles and "." in mol.smiles:
                continue
            n = mol.num_nodes
            num_ref = mol.pos_ref.reshape(-1, n, 3).shape[0]
            gens = np.asarray(mol.meta["pos_gen"]).reshape(-1, n, 3)
            need = num_ref * self.ratio
            if gens.shape[0] < need:
                continue
            mol.meta["pos_gen"] = gens[:need]
            out.append(mol)
        return out

    def __call__(self, packed_list: List[Molecule], start_idx: int = 0) -> CovMatResults:
        filtered = self.filter(packed_list)[start_idx:]
        self.print_fn(f"Filtered: {len(filtered)} / {len(packed_list)}")
        func = partial(
            _confusion_for, use_ff=self.use_force_field, max_maps=self.max_maps
        )
        if self.num_workers > 1 and len(filtered) > 1:
            with mp.get_context("spawn").Pool(self.num_workers) as pool:
                mats = list(pool.map(func, filtered))
        else:
            mats = [func(m) for m in filtered]

        covr, matr, covp, matp = [], [], [], []
        for cm in mats:
            ref_min = cm.min(axis=-1)   # (num_ref,)
            gen_min = cm.min(axis=0)    # (num_gen,)
            covr.append((ref_min[:, None] <= self.thresholds[None]).mean(0))
            covp.append((gen_min[:, None] <= self.thresholds[None]).mean(0))
            matr.append(ref_min.mean())
            matp.append(gen_min.mean())
        return CovMatResults(
            CoverageR=np.vstack(covr) if covr else np.zeros((0, len(self.thresholds))),
            MatchingR=np.array(matr),
            CoverageP=np.vstack(covp) if covp else np.zeros((0, len(self.thresholds))),
            MatchingP=np.array(matp),
            thresholds=self.thresholds,
        )


def print_covmat_results(results: CovMatResults, print_fn=print):
    """Summary table (reference: covmat.py:43-72). Returns rows as a list of
    dicts (and a pandas DataFrame if pandas is available)."""
    rows = []
    for k, t in enumerate(results.thresholds):
        rows.append({
            "threshold": float(t),
            "COV-R_mean": float(np.mean(results.CoverageR[:, k])),
            "COV-R_median": float(np.median(results.CoverageR[:, k])),
            "COV-R_std": float(np.std(results.CoverageR[:, k])),
            "COV-P_mean": float(np.mean(results.CoverageP[:, k])),
            "COV-P_median": float(np.median(results.CoverageP[:, k])),
            "COV-P_std": float(np.std(results.CoverageP[:, k])),
        })
    print_fn(
        "MAT-R_mean: %.4f | MAT-R_median: %.4f | MAT-R_std %.4f"
        % (np.mean(results.MatchingR), np.median(results.MatchingR),
           np.std(results.MatchingR))
    )
    print_fn(
        "MAT-P_mean: %.4f | MAT-P_median: %.4f | MAT-P_std %.4f"
        % (np.mean(results.MatchingP), np.median(results.MatchingP),
           np.std(results.MatchingP))
    )
    try:
        import pandas as pd

        df = pd.DataFrame(rows).set_index("threshold")
        print_fn("\n" + str(df))
        return df
    except ImportError:
        return rows
