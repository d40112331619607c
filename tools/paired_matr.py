"""Paired per-molecule comparison of ALL FOUR protocol metrics between
eval_covmat outputs (MAT-R, MAT-P, COV-R@t, COV-P@t).

Mean metric differences between sampling protocols are small relative to the
per-molecule spread (MAT-R std ~0.29 over 60 molecules -> SEM ~0.037), so
unpaired means cannot distinguish them. Both runs score the SAME held-out
molecules, so the paired per-molecule delta removes the molecule effect.

The reference protocol reports all four metrics (reference:
src/agdiff/utils/evaluation/covmat.py:133-154); recall-side metrics alone
are blind to junk conformers when the sampler over-disperses (the measured
regime here: gen/ref diversity ratio 1.38, arm N) — precision (MAT-P/COV-P)
must ride along in every significance claim.

Usage:
  python tools/paired_matr.py baseline_covmat.npz candidate_covmat.npz ...
      [--thresholds 0.5,1.0]

Per metric: prints baseline mean, candidate mean, paired delta vs the first
file, t statistic and a two-sided normal-approximation p-value.
"""

import argparse
import sys
from math import erf, sqrt

import numpy as np

sys.path.insert(0, "/root/repo")

METRICS = ("MatchingR", "MatchingP")  # lower is better
COV_METRICS = ("CoverageR", "CoverageP")  # higher is better


def load_covmat(path: str) -> dict:
    f = np.load(path, allow_pickle=True)
    return {k: np.asarray(f[k]) for k in f.files}


def load_matching_r(path: str) -> np.ndarray:
    """Back-compat helper (round-2/3 scripts import this)."""
    return load_covmat(path)["MatchingR"]


def paired_stats(base: np.ndarray, cand: np.ndarray):
    d = cand - base
    n = len(d)
    se = d.std(ddof=1) / np.sqrt(n)
    t = d.mean() / se if se > 0 else 0.0
    p = 2 * (1 - 0.5 * (1 + erf(abs(t) / sqrt(2)))) if se > 0 else 1.0
    return d.mean(), se, t, p


def _rows_for(data: dict, thresholds):
    """Yield (label, per-molecule vector) for every reported metric."""
    for key, label in (("MatchingR", "MAT-R"), ("MatchingP", "MAT-P")):
        if key in data:
            yield label, data[key]
    grid = data.get("thresholds")
    for key, label in (("CoverageR", "COV-R"), ("CoverageP", "COV-P")):
        if key not in data or grid is None:
            continue
        cov = data[key]  # (n_mols, n_thresholds)
        for t in thresholds:
            idx = int(np.abs(grid - t).argmin())
            yield f"{label}@{grid[idx]:.2f}", cov[:, idx]


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    ap = argparse.ArgumentParser(usage=__doc__)
    ap.add_argument("files", nargs="+")
    ap.add_argument("--thresholds", default="0.5,1.0",
                    help="COV thresholds to report (Angstrom; nearest grid "
                         "point is used). Reference convention: 0.5 QM9 / "
                         "1.25 Drugs")
    args = ap.parse_args(argv)
    if len(args.files) < 2:
        print(__doc__)
        return 1
    thresholds = [float(x) for x in args.thresholds.split(",") if x]

    base = load_covmat(args.files[0])
    print(f"baseline: {args.files[0]} (n={len(base['MatchingR'])})")
    print(f"{'metric':>12s} {'candidate':36s} {'base':>7s} {'cand':>7s} "
          f"{'delta':>8s} {'+-SE':>7s} {'t':>6s} {'p':>7s}")
    for path in args.files[1:]:
        cand = load_covmat(path)
        name = path if len(path) <= 36 else "..." + path[-33:]
        for label, bvec in _rows_for(base, thresholds):
            cvec = dict(_rows_for(cand, thresholds)).get(label)
            if cvec is None or len(cvec) != len(bvec):
                print(f"{label:>12s} {name:36s} SKIP (missing or n mismatch)")
                continue
            dm, se, t, p = paired_stats(bvec, cvec)
            print(f"{label:>12s} {name:36s} {bvec.mean():7.4f} "
                  f"{cvec.mean():7.4f} {dm:+8.4f} {se:7.4f} {t:+6.2f} "
                  f"{p:7.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
