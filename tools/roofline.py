"""Roofline analysis of the sampler step: is the 2.4 ms/step floor
structural? (VERDICT r3 "Next round" #4.)

For each requested engine this builds the ladder scan, compiles it AOT, and
reads XLA's compiled cost analysis (flops, bytes accessed) — compile-time
metadata that works through the remote-TPU tunnel where a device trace does
not.

CALIBRATION (measured, do not "fix"): XLA's cost_analysis counts a
lax.scan/while body ONCE, independent of trip count — verified with a
controlled scan (matmul body, length 10 vs 100: identical flops, exactly
one iteration's worth). Since the ladder prologue (init noise, constants)
is negligible next to the body, the reported program totals ARE the
per-step numbers; nothing is divided by the scan length.

Semantics of the two counters, and what they bound:

  flops          -> per-step model FLOPs (exact at the HLO level)
  bytes accessed -> an UPPER bound on per-step HBM traffic: it sums every
                    HLO operand/output access, including reads that stay
                    resident in VMEM/registers across fusions, so it can
                    exceed what the HBM ever sees.

Derived:

  MFU              = flops / (t_step * peak_flops)
  bw_time_ub_ms    = bytes_ub / peak_bw      (step time if every counted
                                              byte hit HBM at peak)
  implied_gb_bw    = t_step * peak_bw        (traffic IF the step were
                                              exactly bandwidth-bound)

Verdict logic: MFU > 0.5 -> MXU-bound. Else if even the byte upper bound
cannot fill 60% of the measured step, the step is provably NOT
bandwidth-bound -> latency/occupancy. Else the truth lies between
implied_gb_bw and bytes_ub: report "<= HBM-bound" with both numbers.

v5e peaks (public spec): 197 TFLOP/s bf16, 819 GB/s HBM. Override with
--peak-tflops / --peak-gbs for other chips.

Usage (TPU):
  python tools/roofline.py --engines fast-xla,fast-stack,fast-tight
  python tools/roofline.py --nodes 64 --batch 48 --heavy 20 \
      --engines fast-xla,fast-tight          # Drugs size

Also supports --mode train (the chunked train step).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    from agdiff_tpu.cli._common import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--engines", default="fast-xla,fast-stack,fast-tight")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nodes", type=int, default=32)
    ap.add_argument("--heavy", type=int, default=9)
    ap.add_argument("--steps", type=int, default=250,
                    help="scan length to compile/measure (per-step numbers "
                         "divide by this)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--peak-gbs", type=float, default=819.0)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import numpy as np

    from agdiff_tpu.config import ModelConfig
    from agdiff_tpu.data.bucketing import pad_molecules
    from agdiff_tpu.data.synthetic import synthetic_dataset
    from agdiff_tpu.models.dualenc import get_model
    from agdiff_tpu.models.schedules import make_diffusion
    from agdiff_tpu.models.tight_forward import pair_capacity_for
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
    scfg = SamplerConfig(n_steps=args.steps, ladder="suffix", w_global=0.3,
                         global_start_sigma=0.5, clip_local=20.0)
    pos_init = jax.random.normal(jax.random.PRNGKey(1), batch.pos.shape)
    key = jax.random.PRNGKey(2)

    rows = []
    for name in args.engines.split(","):
        engine = {"fast-xla": None, "fast-stack": "stack",
                  "fast-tight": "tight", "fast-mono": "mono",
                  "fast-slim": "slim", "fast-slim8": "slim8",
                  "fast-tight-slim": "tight-slim",
                  "fast-tight-slim8": "tight-slim8"}[name]
        tightish = bool(engine) and engine.startswith("tight")
        cap = (pair_capacity_for(len(mols[0].atom_type))
               if tightish else None)
        fn = build_fast_sampler(config, variables, diffusion, scfg,
                                engine=engine, pair_capacity=cap,
                                shared_pairs=tightish)
        lowered = fn.lower(batch, pos_init, key)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns one dict per device
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))
        # first call may include backend warm-up; time min of reps after.
        # Keys are created OUTSIDE the timed region: each PRNGKey is its own
        # ~25 ms host-side dispatch through the remote-chip tunnel.
        out = compiled(batch, pos_init, key)
        _ = jax.device_get(out.pos)
        rep_keys = [jax.random.PRNGKey(3 + r) for r in range(args.reps)]
        times = []
        for r in range(args.reps):
            t0 = time.perf_counter()
            out = compiled(batch, pos_init, rep_keys[r])
            _ = jax.device_get(out.pos)
            times.append(time.perf_counter() - t0)
        t_step = min(times) / args.steps
        # cost_analysis counts the scan body once (see module docstring):
        # the program totals ARE the per-step numbers.
        flops_step = flops
        bytes_ub = bytes_acc
        mfu = flops_step / (t_step * args.peak_tflops * 1e12)
        bw_time_ub = bytes_ub / (args.peak_gbs * 1e9)
        rows.append({
            "engine": name,
            "ms_per_step": round(t_step * 1e3, 3),
            "gflops_per_step": round(flops_step / 1e9, 2),
            "mfu": round(mfu, 4),
            "compute_time_ms": round(
                flops_step / (args.peak_tflops * 1e12) * 1e3, 4),
            "hbm_bytes_ub_gb": round(bytes_ub / 1e9, 3),
            "bw_time_ub_ms": round(bw_time_ub * 1e3, 3),
            "implied_gb_if_bw_bound": round(
                t_step * args.peak_gbs * 1e9 / 1e9, 3),
            "bw_ub_fraction_of_step": round(bw_time_ub / t_step, 3),
            "arithmetic_intensity_ub": round(
                flops_step / max(bytes_ub, 1), 2),
        })
        print(json.dumps(rows[-1]), flush=True)

    verdicts = []
    for r in rows:
        if r["mfu"] > 0.5:
            bound = "MXU-bound"
        elif r["bw_ub_fraction_of_step"] < 0.6:
            bound = ("latency/occupancy-bound (even the HLO byte upper "
                     "bound cannot fill the step)")
        else:
            bound = (f"<= HBM-bound: true traffic between "
                     f"{r['implied_gb_if_bw_bound']} GB (if exactly "
                     f"BW-bound) and the {r['hbm_bytes_ub_gb']} GB "
                     f"HLO upper bound")
        verdicts.append(f"{r['engine']}: {bound}")
    print(json.dumps({
        "batch": args.batch, "nodes": args.nodes, "heavy": args.heavy,
        "dtype": args.dtype, "measured_steps": args.steps,
        "peak_tflops": args.peak_tflops, "peak_gbs": args.peak_gbs,
        "verdicts": verdicts, "rows": rows,
    }))


if __name__ == "__main__":
    main()
