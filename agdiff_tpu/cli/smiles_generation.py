"""SMILES -> conformer generation CLI (reference: smiles_generation.py).

Usage:
  python -m agdiff_tpu.cli.smiles_generation <ckpt_or_logdir> \
      --smiles "CCO" --out_sdf out.sdf [--num_samples auto] [flags...]

Pipeline (reference smiles_generation.py:253-445): SMILES -> AddHs ->
ETKDGv3 embedding (RDKit) -> order-3 extended graph -> Langevin sampling ->
SDF export. The `num_refs = 1100 // num_nodes` heuristic (line 325) and the
5x sample multiplier (328) are preserved under --num_samples auto.
Requires RDKit (parsing + SDF); sampling itself is RDKit-free.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    from agdiff_tpu.cli._common import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", help="log dir or checkpoint path")
    ap.add_argument("--smiles", required=True)
    ap.add_argument("--out_sdf", required=True)
    ap.add_argument("--num_samples", default="auto",
                    help="'auto' = 5 * (1100 // num_nodes), or an integer")
    ap.add_argument("--n_steps", type=int, default=5000)
    ap.add_argument("--step_lr", type=float, default=1e-6)
    ap.add_argument("--w_global", type=float, default=1.0)
    ap.add_argument("--global_start_sigma", type=float, default=0.5)
    ap.add_argument("--clip", type=float, default=1000.0)
    ap.add_argument("--clip_local", type=float, default=None)
    ap.add_argument("--seed", type=int, default=2021)
    ap.add_argument("--chunk_size", type=int, default=64)
    ap.add_argument("--fast", action="store_true",
                    help="optimized inference path (folded BatchNorm; large "
                         "buckets auto-select the tight engine)")
    ap.add_argument("--engine", default=None,
                    choices=["xla", "tight", "mono"])
    args = ap.parse_args(argv)

    import jax

    from agdiff_tpu.chem.rdkit_bridge import smiles_to_molecule, write_sdf
    from agdiff_tpu.eval.generate import GenerationRunner
    from agdiff_tpu.models.dualenc import get_model
    from agdiff_tpu.models.schedules import make_diffusion
    from agdiff_tpu.sampling.langevin import SamplerConfig
    from agdiff_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
    from agdiff_tpu.utils.logging import get_logger

    logger = get_logger("smiles_generation")
    if os.path.isdir(os.path.join(args.ckpt, "checkpoints")):
        ckpt_path, _ = latest_checkpoint(args.ckpt)
    else:
        ckpt_path = args.ckpt
    ckpt = load_checkpoint(ckpt_path)
    config = ckpt["config"]
    model = get_model(config.model)
    variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}

    mol = smiles_to_molecule(args.smiles, seed=args.seed)
    logger.info("%s -> %d atoms (with H)", args.smiles, mol.num_nodes)
    if args.num_samples == "auto":
        num_refs = max(1100 // mol.num_nodes, 1)
        num_samples = 5 * num_refs
    else:
        num_samples = int(args.num_samples)

    scfg = SamplerConfig(
        n_steps=args.n_steps, step_lr=args.step_lr, w_global=args.w_global,
        global_start_sigma=args.global_start_sigma, clip=args.clip,
        clip_local=args.clip_local,
    )
    runner = GenerationRunner(
        model, variables, make_diffusion(config.model), scfg,
        buckets=config.buckets.max_nodes, chunk_size=args.chunk_size,
        logger=logger, use_fast=args.fast, engine=args.engine,
        model_config=config.model,
    )
    pos_gen = runner.generate_molecule(
        mol, num_samples, jax.random.PRNGKey(args.seed)
    )
    write_sdf(args.out_sdf, mol, pos_gen)
    logger.info("wrote %d conformers -> %s", num_samples, args.out_sdf)


if __name__ == "__main__":
    main()
