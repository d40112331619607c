"""Dataset preprocessing CLI: GEOM raw dumps or reference pickles -> the
native .npz molecule format.

Usage:
  # raw GEOM (requires RDKit):
  python -m agdiff_tpu.cli.preprocess geom --base_path data/GEOM/rdkit_folder \
      --dataset qm9 --out_dir data/GEOM/QM9
  # convert reference .pkl datasets:
  python -m agdiff_tpu.cli.preprocess convert train_data_40k.pkl out.npz
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    from agdiff_tpu.cli._common import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("geom", help="preprocess raw GEOM (needs RDKit)")
    g.add_argument("--base_path", required=True)
    g.add_argument("--dataset", choices=["qm9", "drugs"], required=True)
    g.add_argument("--out_dir", required=True)
    g.add_argument("--conf_per_mol", type=int, default=5)
    g.add_argument("--tot_mol_size", type=int, default=50000)
    g.add_argument("--train_size", type=float, default=0.8)
    g.add_argument("--seed", type=int, default=2021)
    g.add_argument("--test_min_conf", type=int, default=50)
    g.add_argument("--test_max_conf", type=int, default=500)
    g.add_argument("--test_mol_size", type=int, default=1000)

    c = sub.add_parser("convert", help="reference .pkl -> native .npz")
    c.add_argument("src")
    c.add_argument("dst")

    args = ap.parse_args(argv)

    from agdiff_tpu.chem.mol import save_molecules
    from agdiff_tpu.utils.logging import get_logger

    logger = get_logger("preprocess")

    if args.cmd == "convert":
        from agdiff_tpu.data.geom import load_reference_pickle

        mols = load_reference_pickle(args.src)
        save_molecules(args.dst, mols)
        logger.info("converted %d molecules: %s -> %s", len(mols), args.src,
                    args.dst)
        return

    from agdiff_tpu.data.geom import (
        get_test_set_with_large_num_conf,
        preprocess_geom_fixed_num_conf,
    )

    os.makedirs(args.out_dir, exist_ok=True)
    train, val, test, _ = preprocess_geom_fixed_num_conf(
        args.base_path, args.dataset, conf_per_mol=args.conf_per_mol,
        train_size=args.train_size, tot_mol_size=args.tot_mol_size,
        seed=args.seed,
    )
    k = args.tot_mol_size // 1000
    save_molecules(
        os.path.join(args.out_dir, f"train_data_{int(k*0.8)}k.npz"), train)
    save_molecules(os.path.join(args.out_dir, "val_data_5k.npz"), val)
    save_molecules(os.path.join(args.out_dir, "test_data_5k.npz"), test)
    logger.info("splits: train %d / val %d / test %d", len(train), len(val),
                len(test))

    block = sorted({m.smiles for m in train + val if m.smiles})
    packed = get_test_set_with_large_num_conf(
        args.base_path, args.dataset, block=block,
        tot_mol_size=args.test_mol_size, min_conf=args.test_min_conf,
        max_conf=args.test_max_conf, seed=args.seed,
    )
    save_molecules(
        os.path.join(args.out_dir, "test_data_large_conf.npz"), packed)
    logger.info("packed test set: %d molecules", len(packed))


if __name__ == "__main__":
    main()
