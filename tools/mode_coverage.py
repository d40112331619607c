"""Torsional-diversity diagnostic for a generation run (multiref protocol).

For each molecule in a samples_all.npz, reports the mean pairwise
symmetry-aware RMSD (a) among its GENERATED samples and (b) among its
REFERENCE conformers. Interpreting arm-N-style runs: low COV-R with
gen-diversity << ref-diversity is MODE COLLAPSE (the sampler sits in one
torsional basin); low COV-R with comparable diversity is geometric error.
References are torsion-distinct only under --synthetic_multiref
(data/synthetic.torsion_conformer) — on the legacy jitter protocol
ref-diversity just reads the thermal jitter scale (~0.2 A).

Usage: PYTHONPATH=/root/repo python tools/mode_coverage.py \
           /tmp/rehearsal3n/armN/samples_all.npz [--max_pairs 20]
"""

import argparse
import itertools

import numpy as np

from agdiff_tpu.chem.rmsd import best_rmsd
from agdiff_tpu.eval.generate import load_samples
import sys

sys.path.insert(0, "/root/repo")


def mean_pairwise(mol, confs, max_pairs):
    pairs = list(itertools.combinations(range(confs.shape[0]), 2))[:max_pairs]
    if not pairs:
        return float("nan")
    return float(np.mean([
        best_rmsd(mol, confs[a], confs[b]) for a, b in pairs
    ]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("samples", help="samples_all.npz from cli.generate")
    ap.add_argument("--max_pairs", type=int, default=20,
                    help="pairwise-RMSD pairs per molecule per side")
    args = ap.parse_args(argv)

    mols = load_samples(args.samples)
    gen_div, ref_div = [], []
    print(f"{'mol':>4s} {'atoms':>5s} {'gen-div':>8s} {'ref-div':>8s}")
    for k, m in enumerate(mols):
        if m.pos_ref is None or "pos_gen" not in m.meta:
            continue
        n = m.num_nodes
        g = mean_pairwise(m, m.meta["pos_gen"].reshape(-1, n, 3),
                          args.max_pairs)
        r = mean_pairwise(m, m.pos_ref.reshape(-1, n, 3), args.max_pairs)
        gen_div.append(g)
        ref_div.append(r)
        print(f"{k:4d} {n:5d} {g:8.3f} {r:8.3f}")
    print("\nmean gen-diversity %.3f A | mean ref-diversity %.3f A | "
          "ratio %.2f" % (np.nanmean(gen_div), np.nanmean(ref_div),
                          np.nanmean(gen_div) / max(np.nanmean(ref_div),
                                                    1e-9)))


if __name__ == "__main__":
    main()
