"""Summarize a progressive-distillation rehearsal (tools/rehearsal_r3_distill.sh).

Collects MAT-R/COV-R from each student_n*/teacher_e0_n* eval under the arm
root, prints a table, and runs the paired per-molecule significance test
(tools/paired_matr.py) of every run against a baseline covmat npz (the arm-G
full-protocol eval by default).

Usage:
  python tools/distill_report.py /tmp/rehearsal3m \
      [--baseline /tmp/rehearsal3g/samples/samples_all_covmat_raw.npz]
"""

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(__file__))
from paired_matr import load_matching_r, paired_stats  # noqa: E402

import numpy as np  # noqa: E402


def matr_from_log(log_path: str):
    try:
        txt = open(log_path).read()
    except OSError:
        return None
    m = re.findall(r"MAT-R_mean: ([0-9.]+)", txt)
    return float(m[-1]) if m else None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("root", help="arm root (e.g. /tmp/rehearsal3m)")
    ap.add_argument("--baseline", default=None,
                    help="covmat npz with per-molecule MatchingR of the "
                         "full-protocol baseline (for paired stats)")
    args = ap.parse_args(argv)

    def covr_at(name, thr=1.0):
        cov = glob.glob(os.path.join(args.root, name,
                                     "samples_all_covmat*.npz"))
        if not cov:
            return None
        d = np.load(cov[0])
        i = int(np.argmin(np.abs(d["thresholds"] - thr)))
        return float(d["CoverageR"][:, i].mean())

    runs = sorted(glob.glob(os.path.join(args.root, "*", "")))
    print(f"{'run':24s} {'MAT-R':>7s} {'COV-R@1.0':>10s}")
    rows = []
    for d in runs:
        name = os.path.basename(d.rstrip("/"))
        log = os.path.join(args.root, f"{name}.log")
        matr = matr_from_log(log)
        if matr is None:
            continue
        covr = covr_at(name)
        cov_s = f"{covr:10.4f}" if covr is not None else f"{'-':>10s}"
        print(f"{name:24s} {matr:7.4f} {cov_s}")
        rows.append(name)

    if args.baseline and os.path.exists(args.baseline):
        base = load_matching_r(args.baseline)
        print(f"\npaired vs {args.baseline} "
              f"(mean {base.mean():.4f}, n={len(base)})")
        print(f"{'run':24s} {'mean':>7s} {'delta':>8s} {'+-SE':>7s} "
              f"{'t':>6s} {'p':>7s}")
        for name in rows:
            cov = glob.glob(os.path.join(args.root, name,
                                         "samples_all_covmat*.npz"))
            if not cov:
                continue
            cand = load_matching_r(cov[0])
            if len(cand) != len(base):
                print(f"{name:24s} SKIP n={len(cand)}")
                continue
            dm, se, t, p = paired_stats(base, cand)
            print(f"{name:24s} {cand.mean():7.4f} {dm:+8.4f} {se:7.4f} "
                  f"{t:+6.2f} {p:7.4f}")


if __name__ == "__main__":
    main()
