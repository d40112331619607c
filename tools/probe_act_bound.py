"""Upper-bound probe: how much of the per-step forward is activation math?

Monkeypatches ops/approx's softplus/sigmoid/gelu to IDENTITY and A/Bs the
resulting (numerically meaningless) engine against fast-xla in one process.
The ratio bounds the best case for ANY cheaper-activation scheme — if
identity activations don't move ms/step, elementwise op count is not the
lever and the transcendental-replacement direction is refuted.

Usage: python tools/probe_act_bound.py [--nodes 32 --batch 128 --heavy 9]
"""

import argparse
import json
import time
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nodes", type=int, default=32)
    ap.add_argument("--heavy", type=int, default=9)
    ap.add_argument("--bench-steps", type=int, default=250)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--engine", default=None,
                    help="exact-side engine (e.g. pksf); the identity side "
                         "then runs '<engine>-approx' with identity fns — "
                         "for the Pallas stack kernels this bounds the "
                         "EXPOSED in-kernel activation cost, which the "
                         "XLA paths hide under HBM traffic")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from agdiff_tpu.config import ModelConfig
    from agdiff_tpu.data.bucketing import pad_molecules
    from agdiff_tpu.data.synthetic import synthetic_dataset
    from agdiff_tpu.models.dualenc import get_model
    from agdiff_tpu.models.schedules import make_diffusion
    from agdiff_tpu.ops import approx
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

    exact = build_fast_sampler(config, variables, diffusion, scfg,
                               use_pallas=False, engine=args.engine)
    # identity "activations": the compiled program keeps every matmul and
    # every fusion boundary but drops the activation arithmetic entirely
    approx.softplus = lambda x: x
    approx.sigmoid = lambda x: x
    approx.gelu = lambda x: x
    ident_engine = (args.engine + "-approx") if args.engine else "approx"
    ident = build_fast_sampler(config, variables, diffusion, scfg,
                               use_pallas=False, engine=ident_engine)

    exact_name = f"fast-{args.engine}" if args.engine else "fast-xla"
    samplers = {exact_name: exact, "identity-act": ident}
    for name, fn in samplers.items():
        t0 = time.perf_counter()
        _ = jax.device_get(fn(batch, pos_init, jax.random.PRNGKey(2)).pos)
        print(f"# {name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)

    times = {n: [] for n in samplers}
    for r in range(args.reps):
        for n, fn in samplers.items():
            t0 = time.perf_counter()
            _ = jax.device_get(
                fn(batch, pos_init, jax.random.PRNGKey(10 + r)).pos)
            times[n].append(time.perf_counter() - t0)

    out = {}
    for n, ts in times.items():
        out[n] = round(min(ts) * 1000.0 / args.bench_steps, 3)
    out["activation_share_bound"] = round(
        1.0 - out["identity-act"] / out[exact_name], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
