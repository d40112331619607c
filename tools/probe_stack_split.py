"""A/B the stack kernel's aggregation form: doubled-tensor contract vs
split half-dots (stack_packed.SPLIT_AGG).

The round-5 identity-activation probe bounded the in-kernel activation
cost at 5% (probe_act_bound.py --engine pksf: 1.77 vs 1.681 ms/step), so
the kernel is MXU/data-movement-bound. The default aggregation
materializes two (g, 2P, FW) f32 tensors per block (xij = expand(x_cat)
and tt = [t;t]) purely to feed one wide contract dot; the split form
computes a = EI^T(t*EJx) + EJ^T(t*EI x) per graph — same FLOPs, no
doubled tensors, values differ only by f32 accumulation order
(K-sum 992 -> 2x496).

Both samplers are built AND compiled before the flag flips, so the
toggle is trace-safe. Usage:
  python tools/probe_stack_split.py [--nodes 32 --batch 128 --heavy 9]
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
    ap.add_argument("--heavy", type=int, default=9)
    ap.add_argument("--bench-steps", type=int, default=250)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--engine", default="pksf")
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

    samplers = {}
    for name, flag in [("merged", False), ("split", True)]:
        stack_packed.SPLIT_AGG = flag
        fn = build_fast_sampler(config, variables, diffusion, scfg, **kw)
        t0 = time.perf_counter()
        out = fn(batch, pos_init, jax.random.PRNGKey(2))
        _ = jax.device_get(out.pos)
        print(f"# {name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        samplers[name] = fn

    times = {n: [] for n in samplers}
    for r in range(args.reps):
        for n, fn in samplers.items():
            t0 = time.perf_counter()
            _ = jax.device_get(
                fn(batch, pos_init, jax.random.PRNGKey(10 + r)).pos)
            times[n].append(time.perf_counter() - t0)

    out = {n: round(min(ts) * 1000.0 / args.bench_steps, 3)
           for n, ts in times.items()}
    out["split_speedup"] = round(out["merged"] / out["split"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
