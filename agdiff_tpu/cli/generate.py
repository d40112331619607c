"""Generation CLI (reference: scripts/test.py).

Usage:
  python -m agdiff_tpu.cli.generate <log_dir_or_ckpt> --out_dir samples \
      [--test_set data.npz | --synthetic 8] [--start_idx 0 --end_idx 200] \
      [--num_confs 2x] [--n_steps 5000] [--w_global 0.3]

The model config is read from the checkpoint (reference: test.py:111);
sampling hyperparameters are CLI flags (test.py:40-75 defaults).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    from agdiff_tpu.cli._common import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", help="log dir (uses latest/best ckpt) or ckpt "
                                 "path; reference .pt checkpoints are "
                                 "imported automatically")
    ap.add_argument("--ckpt_iter", type=int, default=None)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--test_set", default=None)
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--synthetic_heavy", type=int, default=None,
                    help="max heavy atoms of the synthetic molecules "
                         "(default QM9-like 4-9; 20 ~= Drugs-size)")
    ap.add_argument("--synthetic_rigid", action="store_true",
                    help="deterministic tetrahedral geometry (matches "
                         "cli.train --synthetic_rigid)")
    ap.add_argument("--synthetic_multiref", action="store_true",
                    help="reference conformers are distinct torsion "
                         "conformers (GEOM-faithful COV/MAT protocol) "
                         "instead of jitters of one structure")
    ap.add_argument("--synthetic_chem", default="tree",
                    choices=["tree", "rich"],
                    help="matches cli.train --synthetic_chem")
    ap.add_argument("--start_idx", type=int, default=0)
    ap.add_argument("--end_idx", type=int, default=200)
    ap.add_argument("--num_confs", default="2x")
    # sampling flags (reference scripts/test.py:40-75)
    ap.add_argument("--n_steps", type=int, default=5000)
    ap.add_argument("--ladder", default="suffix",
                    choices=["suffix", "strided"],
                    help="suffix = reference semantics (last n_steps noise "
                         "levels); strided = n_steps levels over the full "
                         "schedule (fast-sampling extension)")
    ap.add_argument("--step_lr", type=float, default=1e-6)
    ap.add_argument("--w_global", type=float, default=1.0)
    ap.add_argument("--global_start_sigma", type=float, default=0.5)
    ap.add_argument("--clip", type=float, default=1000.0)
    ap.add_argument("--clip_local", type=float, default=None)
    ap.add_argument("--clip_pos", type=float, default=None)
    ap.add_argument("--denoise_tail", type=int, default=0,
                    help="extra noise-free steps at the final noise level "
                         "(gradient-only polish; 0 = reference semantics)")
    # the reference accepts these but ignores them (dualenc.py:437-438 —
    # always annealed Langevin); here 'generalized' is a REAL DDIM sampler
    # (sampling/langevin.py module docstring) enabling few-step generation
    # with --ladder strided --n_steps <<5000
    ap.add_argument("--sampling_type", default="ld",
                    choices=["ld", "generalized"],
                    help="'ld' = reference annealed Langevin; 'generalized' "
                         "= DDIM (pair with --ladder strided for few-step)")
    ap.add_argument("--eta", type=float, default=1.0,
                    help="generalized-sampler stochasticity (0 = "
                         "deterministic DDIM); ignored by 'ld'")
    ap.add_argument("--solver", default="euler", choices=["euler", "heun"],
                    help="generalized-sampler ODE solver; 'heun' = "
                         "2nd-order (requires --eta 0, 2 model evals/step)")
    ap.add_argument("--seed", type=int, default=2021)
    ap.add_argument("--chunk_size", type=int, default=64)
    ap.add_argument("--num_devices", type=int, default=0)
    ap.add_argument("--no_resume", action="store_true")
    ap.add_argument("--engine", default=None,
                    choices=["xla", "tight", "mono", "approx", "tight-approx",
                             "slim", "slim8", "tight-slim", "tight-slim8",
                             "pk", "pks", "pksg", "pksf",
                             "tight-pks", "tight-pksg", "tight-pksf",
                             "pksf-approx", "tight-pksf-approx",
                             "pksf-e16", "tight-pksf-e16",
                             "slim-e16", "tight-slim-e16"],
                    help="fast-path engine (with --fast): xla = folded-BN "
                         "XLA; tight = packed pair lists sized to the "
                         "molecule; mono = whole-forward Pallas kernel; "
                         "approx/tight-approx = polynomial transcendentals "
                         "(ops/approx.py, quality-gated); slim/slim8 = "
                         "bf16/fp8 storage of the largest per-edge buffers "
                         "(quality-gated)")
    ap.add_argument("--fast", action="store_true",
                    help="optimized inference path (folded BN + Pallas)")
    ap.add_argument("--packed", action="store_true",
                    help="pack samples of different molecules into shared "
                         "batches (higher utilization when num_refs varies)")
    ap.add_argument("--dtype", default=None,
                    choices=[None, "float32", "bfloat16"],
                    help="override the compute dtype from the checkpoint "
                         "config (bfloat16 sampling of f32-trained models "
                         "is the fastest configuration)")
    ap.add_argument("--ema", action="store_true",
                    help="sample with the EMA shadow weights (checkpoint "
                         "must be trained with train.ema_decay > 0)")
    args = ap.parse_args(argv)

    from agdiff_tpu.cli._common import load_inference_bundle
    from agdiff_tpu.data.dataset import PackedConformationDataset
    from agdiff_tpu.eval.generate import (
        GenerationRunner,
        PackedGenerationRunner,
    )
    from agdiff_tpu.models.dualenc import get_model
    from agdiff_tpu.models.schedules import make_diffusion
    from agdiff_tpu.sampling.langevin import SamplerConfig
    from agdiff_tpu.train.checkpoint import latest_checkpoint
    from agdiff_tpu.utils.logging import get_logger

    if os.path.isdir(os.path.join(args.ckpt, "checkpoints")):
        ckpt_path, it = latest_checkpoint(args.ckpt, args.ckpt_iter)
    else:
        ckpt_path, it = args.ckpt, 0
    out_dir = args.out_dir or os.path.join(
        os.path.dirname(os.path.dirname(ckpt_path)) or ".", f"samples_{it}"
    )
    logger = get_logger("generate", out_dir)
    logger.info("checkpoint: %s -> out: %s", ckpt_path, out_dir)

    config, variables, _, _ = load_inference_bundle(
        args.ckpt, args.ckpt_iter, args.dtype, logger, use_ema=args.ema)
    model = get_model(config.model)
    diffusion = make_diffusion(config.model)

    if args.synthetic:
        from agdiff_tpu.data.synthetic import synthetic_dataset

        kw = {}
        if args.synthetic_heavy is not None:
            from agdiff_tpu.data.synthetic import heavy_range

            lo, hi = heavy_range(args.synthetic_heavy)
            kw = dict(min_heavy=lo, max_heavy=hi)
        dataset = synthetic_dataset(
            args.synthetic, seed=7, num_conformers=3,
            rigid=args.synthetic_rigid, chem=args.synthetic_chem,
            multiref=args.synthetic_multiref, **kw
        )
    else:
        dataset = PackedConformationDataset(args.test_set).molecules

    scfg = SamplerConfig(
        n_steps=args.n_steps, ladder=args.ladder,
        step_lr=args.step_lr, w_global=args.w_global,
        global_start_sigma=args.global_start_sigma, clip=args.clip,
        clip_local=args.clip_local, clip_pos=args.clip_pos,
        denoise_tail=args.denoise_tail,
        sampling_type=args.sampling_type, eta=args.eta, solver=args.solver,
    )
    mesh = None
    if args.num_devices:
        from agdiff_tpu.parallel import make_mesh

        mesh = make_mesh(args.num_devices)
    runner_cls = PackedGenerationRunner if args.packed else GenerationRunner
    runner = runner_cls(
        model, variables, diffusion, scfg,
        buckets=config.buckets.max_nodes, chunk_size=args.chunk_size,
        mesh=mesh, logger=logger, use_fast=args.fast,
        model_config=config.model,
        engine=(None if args.engine == "xla" else args.engine),
    )
    runner.run(
        dataset, out_dir, seed=args.seed, num_confs=args.num_confs,
        start_idx=args.start_idx, end_idx=args.end_idx,
        resume=not args.no_resume,
    )
    logger.info("done: %s/samples_all.npz", out_dir)


if __name__ == "__main__":
    main()
