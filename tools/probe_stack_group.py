"""Sweep the stack kernel's graphs-per-program group size in one process.

GROUP_DEFAULT=16 measured 1.058x over 8 at the QM9 point (B=128 N=32):
halving the grid halves the per-program re-fetch of the stacked weight
blocks. This probe sweeps further values (and the Drugs point, where
B=48 caps the divisor set at {48, 24, 16, 8}) the same trace-safe way as
tools/probe_stack_split.py: every sampler is built AND compiled before
timing, with stack_packed.GROUP_DEFAULT flipped per build.

Usage:
  python tools/probe_stack_group.py --groups 8,16,32
  python tools/probe_stack_group.py --engine tight-pksf \
      --nodes 64 --batch 48 --heavy 20 --groups 8,16,24,48
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nodes", type=int, default=32)
    ap.add_argument("--heavy", type=int, default=9,
                    help="heavy atoms per synthetic molecule")
    ap.add_argument("--bench-steps", type=int, default=250)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--engine", default="pksf")
    ap.add_argument("--groups", default="8,16,32")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from agdiff_tpu.config import ModelConfig
    from agdiff_tpu.data.bucketing import pad_molecules
    from agdiff_tpu.data.synthetic import synthetic_dataset
    from agdiff_tpu.models.dualenc import get_model
    from agdiff_tpu.models.schedules import make_diffusion
    from agdiff_tpu.models.tight_forward import pair_capacity_for
    from agdiff_tpu.ops.pallas import stack_packed
    from agdiff_tpu.sampling import SamplerConfig
    from agdiff_tpu.sampling.langevin import build_fast_sampler

    config = ModelConfig(dtype=args.dtype)
    model = get_model(config)
    diffusion = make_diffusion(config)
    mols = synthetic_dataset(1, seed=0, min_heavy=args.heavy,
                             max_heavy=args.heavy)
    batch = pad_molecules(mols * args.batch, max_nodes=args.nodes,
                          edge_order=3, batch_size=args.batch)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    scfg = SamplerConfig(n_steps=args.bench_steps, w_global=0.3,
                         clip_local=20.0)
    pos_init = jax.random.normal(jax.random.PRNGKey(1), batch.pos.shape)

    tight = args.engine.startswith("tight")
    kw = dict(
        engine=args.engine, use_pallas=False,
        pair_capacity=(pair_capacity_for(max(len(m.atom_type)
                                             for m in mols))
                       if tight else None),
        shared_pairs=tight,
    )

    groups = [int(g) for g in args.groups.split(",")]
    default = stack_packed.GROUP_DEFAULT
    samplers = {}
    try:
        for gval in groups:
            eff = stack_packed._stack_group(args.batch, gval)
            if eff != gval:
                print(f"# group {gval}: Mosaic-legal fallback is {eff}, "
                      "skipping", flush=True)
                continue
            stack_packed.GROUP_DEFAULT = gval
            fn = build_fast_sampler(config, variables, diffusion, scfg, **kw)
            t0 = time.perf_counter()
            out = fn(batch, pos_init, jax.random.PRNGKey(2))
            _ = jax.device_get(out.pos)
            print(f"# group {gval}: compile+first "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            samplers[gval] = fn
    finally:
        stack_packed.GROUP_DEFAULT = default

    times = {n: [] for n in samplers}
    for r in range(args.reps):
        for n, fn in samplers.items():
            t0 = time.perf_counter()
            _ = jax.device_get(
                fn(batch, pos_init, jax.random.PRNGKey(10 + r)).pos)
            times[n].append(time.perf_counter() - t0)

    out = {str(n): round(min(ts) * 1000.0 / args.bench_steps, 3)
           for n, ts in times.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
