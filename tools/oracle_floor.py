"""Data-noise floor of the synthetic rehearsal protocol.

The synthetic reference conformers are jittered copies (sigma=0.15 A/atom)
of one primary conformer, so even a PERFECT model cannot reach MAT-R 0 —
this script scores the primary conformer itself as every generated sample,
giving the oracle floor of the protocol.

Measured (60 held-out rich molecules, seed 7, 2x refs):
  ORACLE MAT-R mean 0.196 A, median 0.195, COV-R@0.5 = 1.000
So the ~0.68 A plateau = ~0.20 data noise + ~0.48 genuine model/sampling
error; the plateau is NOT data-noise-limited.

Usage: PYTHONPATH=/root/repo python tools/oracle_floor.py [--chem rich]
"""

import argparse

import numpy as np

from agdiff_tpu.data.synthetic import synthetic_dataset
from agdiff_tpu.eval.covmat import CovMatEvaluator

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--chem", default="rich", choices=["tree", "rich"])
    ap.add_argument("--num", type=int, default=60)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    mols = synthetic_dataset(args.num, seed=args.seed, num_conformers=3,
                             chem=args.chem)
    for m in mols:
        m.meta["pos_gen"] = np.repeat(m.pos[None], 2 * m.num_ref, axis=0)
    res = CovMatEvaluator(num_workers=8)(mols)
    k = int(np.argmin(np.abs(res.thresholds - 0.5)))
    print("ORACLE MAT-R mean %.4f median %.4f | COV-R@0.5 %.3f"
          % (np.mean(res.MatchingR), np.median(res.MatchingR),
             np.mean(res.CoverageR[:, k])))
