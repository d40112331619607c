"""Data-noise floor of the synthetic rehearsal protocol.

Legacy protocol (jitter refs): reference conformers are jittered copies
(sigma=0.15 A/atom) of one primary conformer, so even a PERFECT model
cannot reach MAT-R 0 — scoring the primary conformer itself as every
generated sample gives the oracle floor.

Measured (60 held-out rich molecules, seed 7, 2x refs):
  ORACLE MAT-R mean 0.196 A, median 0.195, COV-R@0.5 = 1.000
So the ~0.68 A plateau = ~0.20 data noise + ~0.48 genuine model/sampling
error; the plateau is NOT data-noise-limited.

--multiref scores the GEOM-faithful protocol (refs are distinct torsion
conformers, data/synthetic.torsion_conformer) with TWO oracles:
  * distribution oracle — samples are fresh torsion draws from the same
    process (the true achievable floor for a perfect conditional model);
  * mode-collapse oracle — the primary conformer repeated (what a model
    that captures only one torsional mode scores on this protocol).

Usage: PYTHONPATH=/root/repo python tools/oracle_floor.py [--chem rich]
       [--multiref]
"""

import argparse

import numpy as np

from agdiff_tpu.data.synthetic import synthetic_dataset, torsion_conformer
from agdiff_tpu.eval.covmat import CovMatEvaluator
import sys

sys.path.insert(0, "/root/repo")


def score(mols, make_gen, label):
    for m in mols:
        m.meta["pos_gen"] = make_gen(m)
    res = CovMatEvaluator(num_workers=8)(mols)
    th = res.thresholds
    k5 = int(np.argmin(np.abs(th - 0.5)))
    k10 = int(np.argmin(np.abs(th - 1.0)))
    print("%s MAT-R mean %.4f median %.4f | COV-R@0.5 %.3f | COV-R@1.0 %.3f"
          % (label, np.mean(res.MatchingR), np.median(res.MatchingR),
             np.mean(res.CoverageR[:, k5]), np.mean(res.CoverageR[:, k10])))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--chem", default="rich", choices=["tree", "rich"])
    ap.add_argument("--num", type=int, default=60)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--multiref", action="store_true",
                    help="torsion-conformer references (GEOM-faithful "
                         "protocol); scores distribution + mode-collapse "
                         "oracles")
    args = ap.parse_args()

    mols = synthetic_dataset(args.num, seed=args.seed, num_conformers=3,
                             chem=args.chem, multiref=args.multiref)
    if args.multiref:
        rng = np.random.default_rng(123)
        score(mols,
              lambda m: np.stack([torsion_conformer(m, rng, jitter=0.15)
                                  for _ in range(2 * m.num_ref)]),
              "DISTRIBUTION-ORACLE")
        score(mols,
              lambda m: np.repeat(m.pos[None], 2 * m.num_ref, axis=0),
              "MODE-COLLAPSE")
    else:
        score(mols,
              lambda m: np.repeat(m.pos[None], 2 * m.num_ref, axis=0),
              "ORACLE")
