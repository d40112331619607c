"""Paired per-molecule MAT-R comparison between two eval_covmat outputs.

Mean MAT-R differences between sampling protocols are small relative to the
per-molecule spread (std ~0.29 over 60 molecules -> SEM ~0.037), so
unpaired means cannot distinguish them. Both runs score the SAME held-out
molecules, so the paired per-molecule delta removes the molecule effect.

Usage:
  python tools/paired_matr.py baseline_covmat.npz candidate_covmat.npz ...

Prints mean, paired delta vs the first file, t statistic and a two-sided
normal-approximation p-value per candidate.
"""

import sys
from math import erf, sqrt

import numpy as np


def load_matching_r(path: str) -> np.ndarray:
    return np.asarray(np.load(path, allow_pickle=True)["MatchingR"])


def paired_stats(base: np.ndarray, cand: np.ndarray):
    d = cand - base
    n = len(d)
    se = d.std(ddof=1) / np.sqrt(n)
    t = d.mean() / se
    p = 2 * (1 - 0.5 * (1 + erf(abs(t) / sqrt(2))))
    return d.mean(), se, t, p


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__)
        return 1
    base = load_matching_r(argv[0])
    print(f"baseline {argv[0]}: mean MAT-R {base.mean():.4f} (n={len(base)})")
    print(f"{'candidate':40s} {'mean':>7s} {'delta':>8s} {'+-SE':>7s} "
          f"{'t':>6s} {'p':>7s}")
    for path in argv[1:]:
        cand = load_matching_r(path)
        if len(cand) != len(base):
            print(f"{path}: SKIP (n={len(cand)} != {len(base)})")
            continue
        dm, se, t, p = paired_stats(base, cand)
        print(f"{path:40s} {cand.mean():7.4f} {dm:+8.4f} {se:7.4f} "
              f"{t:+6.2f} {p:7.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
