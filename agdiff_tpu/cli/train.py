"""Training CLI (reference: scripts/train.py).

Usage:
  python -m agdiff_tpu.cli.train configs/qm9_default.yml [--logdir logs]
  python -m agdiff_tpu.cli.train <previous_log_dir>          # resume
  python -m agdiff_tpu.cli.train configs/... --synthetic 256 # no dataset

As in the reference (train.py:39-42), passing a log DIRECTORY as the config
argument resumes that run (config is read from the snapshot inside it).
"""

from __future__ import annotations

import argparse
import os
import shutil


def main(argv=None):
    from agdiff_tpu.cli._common import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="config YAML, or a log dir to resume")
    ap.add_argument("--resume_iter", type=int, default=None)
    ap.add_argument("--logdir", default="./logs")
    ap.add_argument("--tag", default="")
    ap.add_argument("--max_iters", type=int, default=None)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="train on N synthetic molecules (no dataset needed)")
    ap.add_argument("--synthetic_rigid", action="store_true",
                    help="deterministic tetrahedral geometry (conformation "
                         "is a function of the graph -> fully learnable; "
                         "default random-torsion molecules are not)")
    ap.add_argument("--synthetic_heavy", type=int, default=None,
                    help="max heavy atoms of the synthetic molecules "
                         "(default QM9-like 4-9; 20 ~= Drugs-size)")
    ap.add_argument("--synthetic_confs", type=int, default=1,
                    help="conformers per synthetic molecule (distinct "
                         "torsion conformers as separate datapoints, like "
                         "GEOM's per-conformer training entries)")
    ap.add_argument("--synthetic_chem", default="tree",
                    choices=["tree", "rich"],
                    help="'rich' = rings + DOUBLE/TRIPLE/AROMATIC bonds + "
                         "S/Cl heteroatoms (GEOM-like diversity)")
    ap.add_argument("--num_devices", type=int, default=0,
                    help="data-parallel over this many devices (0 = single)")
    args = ap.parse_args(argv)

    from agdiff_tpu.config import load_config
    from agdiff_tpu.data.dataset import ConformationDataset
    from agdiff_tpu.train.trainer import Trainer
    from agdiff_tpu.utils.logging import get_logger, get_new_log_dir
    from agdiff_tpu.utils.misc import seed_all

    resume = os.path.isdir(args.config)
    if resume:
        resume_from = args.config
        config_path = os.path.join(resume_from, "config.yml")
        log_dir = resume_from
    else:
        config_path = args.config
        name = os.path.splitext(os.path.basename(config_path))[0]
        log_dir = get_new_log_dir(args.logdir, prefix=name, tag=args.tag)
        shutil.copyfile(config_path, os.path.join(log_dir, "config.yml"))

    config = load_config(config_path)
    seed_all(config.train.seed)
    logger = get_logger("train", log_dir)
    logger.info("config: %s | log_dir: %s", config_path, log_dir)

    if args.synthetic:
        from agdiff_tpu.data.synthetic import synthetic_dataset

        kw = {}
        if args.synthetic_heavy is not None:
            from agdiff_tpu.data.synthetic import heavy_range

            lo, hi = heavy_range(args.synthetic_heavy)
            kw = dict(min_heavy=lo, max_heavy=hi)
        mols = synthetic_dataset(args.synthetic, seed=config.train.seed,
                                 rigid=args.synthetic_rigid,
                                 chem=args.synthetic_chem, **kw)
        split = max(1, int(len(mols) * 0.9))
        tr_mols, va_mols = mols[:split], mols[split:]
        if args.synthetic_confs > 1:
            # GEOM-style per-conformer datapoints (distinct torsion
            # conformers of each graph); expand AFTER the molecule-level
            # split so no graph leaks across train/val
            from agdiff_tpu.data.synthetic import expand_conformers

            tr_mols = expand_conformers(tr_mols, args.synthetic_confs,
                                        seed=config.train.seed + 1)
            va_mols = expand_conformers(va_mols, args.synthetic_confs,
                                        seed=config.train.seed + 2)
        train_set = ConformationDataset(tr_mols)
        val_set = ConformationDataset(va_mols)
    else:
        train_set = ConformationDataset(config.dataset.train)
        val_set = (
            ConformationDataset(config.dataset.val)
            if config.dataset.val else None
        )
    logger.info("train: %d molecules | val: %d", len(train_set),
                len(val_set) if val_set else 0)

    mesh = None
    if args.num_devices:
        from agdiff_tpu.parallel import make_mesh

        mesh = make_mesh(args.num_devices)
        logger.info("data-parallel over %d devices", args.num_devices)

    trainer = Trainer(config, train_set, val_set, log_dir, logger, mesh=mesh)
    if resume:
        trainer.resume(resume_from, args.resume_iter)
    trainer.train(max_iters=args.max_iters)


if __name__ == "__main__":
    main()
