"""In-process A/B of sampling engines on the real chip.

Cross-process bench readings vary +-7% through the axon tunnel (CLAUDE.md),
so perf claims between engines must come from one process: build every
requested engine's sampler, run them interleaved, report min-of-k ms/step
and the ratio to the first engine listed.

Usage:
  python tools/ab_engines.py --engines fast-xla,fast-mono --dtype bfloat16
"""

import argparse
import json
import time
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engines", default="fast-xla,fast-tight",
                    help="comma list of: module, fast-xla, fast-tight "
                         "(shared pair list — repeated-molecule batches), "
                         "fast-tight-pg (per-graph pair lists), "
                         "fast-approx / fast-tight-approx (polynomial "
                         "transcendentals, ops/approx.py), "
                         "fast-slim / fast-slim8 (bf16 / fp8 storage of "
                         "the largest per-edge buffers), "
                         "fast-pallas, fast-mono")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nodes", type=int, default=32)
    ap.add_argument("--heavy", type=int, default=9,
                    help="heavy atoms of the repeated molecule (9 = QM9 max "
                         "~28 atoms; 20 ~= Drugs-size, use --nodes 64)")
    ap.add_argument("--bench-steps", type=int, default=250)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test on local CPU (mono runs interpreted)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # warm executables across processes (a cold 250-step ladder costs
        # ~10 min through the axon tunnel)
        from agdiff_tpu.cli._common import enable_compilation_cache

        enable_compilation_cache()

    from agdiff_tpu.config import ModelConfig
    from agdiff_tpu.data.bucketing import pad_molecules
    from agdiff_tpu.data.synthetic import synthetic_dataset
    from agdiff_tpu.models.dualenc import get_model
    from agdiff_tpu.models.schedules import make_diffusion
    from agdiff_tpu.sampling import SamplerConfig, build_sampler
    from agdiff_tpu.sampling.langevin import build_fast_sampler

    config = ModelConfig(dtype=args.dtype)
    model = get_model(config)
    diffusion = make_diffusion(config)
    mols = synthetic_dataset(1, seed=0, min_heavy=args.heavy,
                             max_heavy=args.heavy)
    batch = pad_molecules(mols * args.batch, max_nodes=args.nodes,
                          edge_order=3, batch_size=args.batch)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    scfg = SamplerConfig(n_steps=args.bench_steps, ladder="suffix",
                         w_global=0.3, global_start_sigma=0.5,
                         clip_local=20.0)
    pos_init = jax.random.normal(jax.random.PRNGKey(1), batch.pos.shape)

    samplers = {}
    for name in args.engines.split(","):
        t0 = time.perf_counter()
        if name == "module":
            fn = build_sampler(model, diffusion, scfg)
            samplers[name] = lambda k, _f=fn: _f(variables, batch, pos_init, k)
        else:
            from agdiff_tpu.models.tight_forward import pair_capacity_for

            engine = {"fast-xla": None, "fast-pallas": "pallas",
                      "fast-mono": "mono", "fast-tight": "tight",
                      "fast-tight-pg": "tight",
                      "fast-approx": "approx",
                      "fast-tight-approx": "tight-approx",
                      "fast-bf16f": None, "fast-tight-bf16f": "tight",
                      "fast-stack": "stack",
                      "fast-slim": "slim", "fast-slim2": "slim2",
                      "fast-slim8": "slim8",
                      "fast-tight-slim": "tight-slim",
                      "fast-tight-slim8": "tight-slim8",
                      "fast-pk": "pk", "fast-pks": "pks",
                      "fast-pksg": "pksg", "fast-pksf": "pksf",
                      "fast-pks-approx": "pks-approx",
                      "fast-pksf-approx": "pksf-approx",
                      "fast-tight-pks": "tight-pks",
                      "fast-tight-pksg": "tight-pksg",
                      "fast-tight-pksf": "tight-pksf",
                      "fast-tight-pksf-approx": "tight-pksf-approx",
                      "fast-tight-tab": "tight"}.get(
                          name,
                          name[len("fast-"):] if name.startswith("fast-")
                          else None)
            if engine is None and name != "fast-xla":
                raise SystemExit(f"unknown engine {name!r}")
            cap = (pair_capacity_for(max(len(m.atom_type) for m in mols))
                   if engine and engine.startswith("tight") else None)
            import jax.numpy as jnp
            fdt = (jnp.bfloat16 if name.endswith("bf16f") else None)
            fn = build_fast_sampler(
                config, variables, diffusion, scfg,
                use_pallas=(engine == "pallas"),
                engine=engine, pair_capacity=cap,
                shared_pairs=(bool(engine) and engine.startswith("tight")
                              and name != "fast-tight-pg"),
                filter_dtype=fdt,
                tabulate=2048 if name == "fast-tight-tab" else 0)
            samplers[name] = lambda k, _f=fn: _f(batch, pos_init, k)
        out = samplers[name](jax.random.PRNGKey(2))
        _ = jax.device_get(out.pos)
        print(f"# {name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)

    times = {n: [] for n in samplers}
    for r in range(args.reps):
        for n, fn in samplers.items():     # interleaved: same thermal/tunnel
            t0 = time.perf_counter()
            out = fn(jax.random.PRNGKey(10 + r))
            _ = jax.device_get(out.pos)
            times[n].append(time.perf_counter() - t0)

    first = args.engines.split(",")[0]
    results = {}
    for n, ts in times.items():
        ms = min(ts) * 1000.0 / args.bench_steps
        results[n] = {
            "ms_per_step": round(ms, 3),
            "conf_per_sec_5000": round(args.batch / (5.0 * ms), 2),
        }
    base = results[first]["ms_per_step"]
    for n in results:
        results[n]["speedup_vs_" + first] = round(
            base / results[n]["ms_per_step"], 3)
    print(json.dumps({"dtype": args.dtype, "batch": args.batch,
                      "nodes": args.nodes, "bench_steps": args.bench_steps,
                      "engines": results}))


if __name__ == "__main__":
    main()
