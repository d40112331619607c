"""Per-step cost floor probe for the sampling ladder.

Every engine (module, fast-xla dense-mirror, tight-shared, monolithic
Pallas) measures 2.4-2.7 ms/step at bf16 B=128 N=32 — including one that
cuts per-pair MLP volume 2.6x. This probe times ladders with progressively
emptier forwards to locate the common floor:

  scaffold  — forward returns zero scores but still computes dist + radius
              masks (sampler scaffolding: eq_transform x2, clip, PRNG,
              centering, NaN flags).
  stepmath  — forward returns constants (no dist/radius either); measures
              scan + step update + PRNG alone.
  full      — fast-xla, for reference in the same process.

Usage: python tools/floor_probe.py [--batch 128] [--steps 250]
"""

import argparse
import json
import time
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nodes", type=int, default=32)
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from agdiff_tpu.config import ModelConfig
    from agdiff_tpu.data.bucketing import pad_molecules
    from agdiff_tpu.data.synthetic import synthetic_dataset
    from agdiff_tpu.models.dualenc import ModelOutput, get_model
    from agdiff_tpu.models.schedules import make_diffusion
    from agdiff_tpu.ops.geometry import pairwise_distance
    from agdiff_tpu.ops.graph import radius_union_mask
    from agdiff_tpu.sampling import SamplerConfig
    from agdiff_tpu.sampling.langevin import (
        build_fast_sampler,
        langevin_dynamics_sample,
    )

    config = ModelConfig(dtype=args.dtype)
    model = get_model(config)
    diffusion = make_diffusion(config)
    mols = synthetic_dataset(1, seed=0, min_heavy=9, max_heavy=9)
    batch = pad_molecules(mols * args.batch, max_nodes=args.nodes,
                          edge_order=3, batch_size=args.batch)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    scfg = SamplerConfig(n_steps=args.steps, ladder="suffix", w_global=0.3,
                         global_start_sigma=0.5, clip_local=20.0)
    pos_init = jax.random.normal(jax.random.PRNGKey(1), batch.pos.shape)

    def scaffold_forward(b, *, extend_order=False, extend_radius=True):
        dist = pairwise_distance(b.pos)
        edge_mask, edge_type, local_mask = radius_union_mask(
            dist, b.bond_adj, b.node_mask, config.cutoff)
        z = jnp.zeros_like(dist)
        return ModelOutput(edge_inv_global=z, edge_inv_local=z,
                           edge_mask=edge_mask, edge_type=edge_type,
                           edge_length=dist, local_mask=local_mask)

    n = args.nodes
    const_mask = jnp.zeros((args.batch, n, n), bool)
    const_d = jnp.ones((args.batch, n, n), jnp.float32)

    def stepmath_forward(b, *, extend_order=False, extend_radius=True):
        z = jnp.zeros((args.batch, n, n), jnp.float32)
        return ModelOutput(edge_inv_global=z, edge_inv_local=z,
                           edge_mask=const_mask,
                           edge_type=const_mask.astype(jnp.int32),
                           edge_length=const_d, local_mask=const_mask)

    samplers = {}
    for name, fwd in (("scaffold", scaffold_forward),
                      ("stepmath", stepmath_forward)):
        samplers[name] = jax.jit(
            lambda b, p, k, _f=fwd: langevin_dynamics_sample(
                None, None, b, p, k, diffusion, scfg, forward_fn=_f))
    fast = build_fast_sampler(config, variables, diffusion, scfg)
    samplers["full-fast-xla"] = lambda b, p, k: fast(b, p, k)

    results = {}
    for name, fn in samplers.items():
        t0 = time.perf_counter()
        out = fn(batch, pos_init, jax.random.PRNGKey(2))
        _ = jax.device_get(out.pos)
        compile_s = time.perf_counter() - t0
        ts = []
        for r in range(4):
            t0 = time.perf_counter()
            out = fn(batch, pos_init, jax.random.PRNGKey(3 + r))
            _ = jax.device_get(out.pos)
            ts.append(time.perf_counter() - t0)
        results[name] = {
            "ms_per_step": round(min(ts) * 1000 / args.steps, 4),
            "compile_s": round(compile_s, 1),
        }
    print(json.dumps({"batch": args.batch, "nodes": args.nodes,
                      "steps": args.steps, "probes": results}))


if __name__ == "__main__":
    main()
