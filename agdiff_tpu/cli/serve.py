"""Persistent generation server CLI.

Loads a checkpoint once, AOT-pre-warms the bucket ladder programs, then
answers generation requests over TCP (agdiff_tpu/serve/server.py protocol)
reusing the compiled-sampler cache — the reference's one-shot pattern
(scripts/test.py:124-195) pays the minutes-scale ladder compile per
invocation; here only the first warm-up does.

Server:
  python -m agdiff_tpu.cli.serve <log_dir_or_ckpt> --port 7521 \
      [--warm_nodes 24,48] [--fast] [--engine tight] [--n_steps 5000] ...

Client (one JSON request, prints the JSON reply):
  python -m agdiff_tpu.cli.serve --submit \
      '{"cmd": "generate", "test_set": "mols.npz", "out_dir": "out"}' \
      --port 7521
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    from agdiff_tpu.cli._common import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", nargs="?", default=None,
                    help="log dir (latest/best ckpt) or ckpt path; "
                         "reference .pt imported automatically. Omit with "
                         "--submit (client mode).")
    ap.add_argument("--ckpt_iter", type=int, default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7521)
    ap.add_argument("--submit", default=None,
                    help="client mode: send this JSON request and print "
                         "the reply")
    ap.add_argument("--warm_nodes", default="",
                    help="comma list of molecule sizes (total atoms) to "
                         "AOT-compile at startup, e.g. 24,48")
    ap.add_argument("--warm_set", default=None,
                    help="warm from a test set (npz): compiles one ladder "
                         "program per (bucket, tight-capacity) class the "
                         "set's molecules map to")
    ap.add_argument("--warm_samples", type=int, default=None,
                    help="samples-per-molecule the warm programs cover "
                         "(default: one full chunk)")
    ap.add_argument("--warm_retry", action="store_true",
                    help="also pre-compile the clip_local retry programs")
    # sampling flags (fixed per server: they are baked into the compiled
    # ladders; start another server for different sampling hyperparameters)
    ap.add_argument("--n_steps", type=int, default=5000)
    ap.add_argument("--ladder", default="suffix",
                    choices=["suffix", "strided"])
    ap.add_argument("--step_lr", type=float, default=1e-6)
    ap.add_argument("--w_global", type=float, default=1.0)
    ap.add_argument("--global_start_sigma", type=float, default=0.5)
    ap.add_argument("--clip", type=float, default=1000.0)
    ap.add_argument("--clip_local", type=float, default=None)
    ap.add_argument("--clip_pos", type=float, default=None)
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
    ap.add_argument("--denoise_tail", type=int, default=0,
                    help="extra noise-free steps at the final noise level "
                         "(gradient-only polish; 0 = reference semantics)")
    ap.add_argument("--chunk_size", type=int, default=64)
    ap.add_argument("--num_devices", type=int, default=0)
    ap.add_argument("--engine", default=None,
                    choices=["xla", "tight", "mono", "approx",
                             "tight-approx", "slim", "slim8",
                             "tight-slim", "tight-slim8"])
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--packed", action="store_true")
    ap.add_argument("--dtype", default=None,
                    choices=[None, "float32", "bfloat16"])
    ap.add_argument("--ema", action="store_true",
                    help="sample with the EMA shadow weights (checkpoint "
                         "must be trained with train.ema_decay > 0)")
    ap.add_argument("--batch_window", type=float, default=0.0,
                    help="dynamic batching: merge generate requests that "
                         "arrive within this many seconds into one packed "
                         "run (requires --packed; 0 = off). Per-request "
                         "seeds keep results independent of co-batching")
    ap.add_argument("--max_nodes", type=int, default=0,
                    help="reject generate requests whose molecules exceed "
                         "this many atoms ({'ok': false} reply, no device "
                         "work) instead of compiling a new ladder program "
                         "mid-request (~7.6 s stall). Recommended: the "
                         "largest --warm_nodes value. 0 = accept any size")
    args = ap.parse_args(argv)

    if args.submit is not None:
        from agdiff_tpu.serve.server import submit

        reply = submit(json.loads(args.submit), host=args.host,
                       port=args.port)
        print(json.dumps(reply))
        return 0 if reply.get("ok") else 1

    if not args.ckpt:
        ap.error("ckpt is required in server mode")

    from agdiff_tpu.cli._common import load_inference_bundle
    from agdiff_tpu.eval.generate import (
        GenerationRunner,
        PackedGenerationRunner,
    )
    from agdiff_tpu.models.dualenc import get_model
    from agdiff_tpu.models.schedules import make_diffusion
    from agdiff_tpu.sampling.langevin import SamplerConfig
    from agdiff_tpu.serve.server import GenerationService, probe_molecule
    from agdiff_tpu.utils.logging import get_logger

    logger = get_logger("serve")
    config, variables, ckpt_path, _ = load_inference_bundle(
        args.ckpt, args.ckpt_iter, args.dtype, logger, use_ema=args.ema)
    logger.info("checkpoint: %s", ckpt_path)
    model = get_model(config.model)
    diffusion = make_diffusion(config.model)
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
    if args.batch_window > 0 and not args.packed:
        ap.error("--batch_window requires --packed (cross-request packing "
                 "uses the PackedGenerationRunner)")
    service = GenerationService(runner, logger=logger,
                                batch_window_s=args.batch_window,
                                max_nodes=args.max_nodes or None)
    if args.warm_nodes or args.warm_set:
        import time

        t0 = time.time()
        # dynamic batching merges bursts onto ANY power-of-two batch size;
        # warm them all so no merge shape compiles mid-request
        all_sizes = args.batch_window > 0
        for n in args.warm_nodes.split(","):
            if not n:
                continue
            compiled = runner.warm(probe_molecule(int(n)),
                                   num_samples=args.warm_samples,
                                   retry=args.warm_retry,
                                   all_sizes=all_sizes)
            logger.info("warmed %s: %s", n, compiled)
        if args.warm_set:
            from agdiff_tpu.data.dataset import PackedConformationDataset
            from agdiff_tpu.serve.server import warm_classes

            mols = PackedConformationDataset(args.warm_set).molecules
            classes = warm_classes(runner, mols)
            for (b, cap), m in sorted(classes.items()):
                compiled = runner.warm(m, num_samples=args.warm_samples,
                                       retry=args.warm_retry,
                                       all_sizes=all_sizes)
                logger.info("warmed bucket %d cap %s: %s", b, cap, compiled)
        logger.info("warm-up done in %.1fs", time.time() - t0)
    service.serve(host=args.host, port=args.port)
    return 0


if __name__ == "__main__":
    sys.exit(main())
