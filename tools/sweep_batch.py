"""One-process batch-size sweep of the sampling engine (VERDICT item 4).

Times the fast-xla bf16 engine at several batch sizes inside a single
process so readings are comparable (the axon tunnel adds +-7% across
processes). Prints one JSON line per batch size.
"""
import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from agdiff_tpu.config import ModelConfig
from agdiff_tpu.data.bucketing import pad_molecules
from agdiff_tpu.data.synthetic import synthetic_dataset
from agdiff_tpu.models.dualenc import get_model
from agdiff_tpu.models.schedules import make_diffusion
from agdiff_tpu.sampling import SamplerConfig
from agdiff_tpu.sampling.langevin import build_fast_sampler

BENCH_STEPS = 250
BATCHES = [129, 132, 136, 140]

config = ModelConfig(dtype="bfloat16")
model = get_model(config)
diffusion = make_diffusion(config)
mols = synthetic_dataset(1, seed=0, min_heavy=9, max_heavy=9)

scfg = SamplerConfig(n_steps=BENCH_STEPS, ladder="suffix", w_global=0.3,
                     global_start_sigma=0.5, clip_local=20.0)

for B in BATCHES:
    batch = pad_molecules(mols * B, max_nodes=32, edge_order=3, batch_size=B)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    fast = build_fast_sampler(config, variables, diffusion, scfg,
                              use_pallas=False)
    pos_init = jax.random.normal(jax.random.PRNGKey(1), batch.pos.shape)
    t0 = time.perf_counter()
    out = fast(batch, pos_init, jax.random.PRNGKey(2))
    _ = jax.device_get(out.pos)
    compile_s = time.perf_counter() - t0
    times = []
    for k in range(3):
        t0 = time.perf_counter()
        out = fast(batch, pos_init, jax.random.PRNGKey(3 + k))
        _ = jax.device_get(out.pos)
        times.append(time.perf_counter() - t0)
    t = min(times)
    ms_per_step = 1000.0 * t / BENCH_STEPS
    conf_per_sec = B / (5000.0 * t / BENCH_STEPS)
    print(json.dumps({"batch": B, "ms_per_step": round(ms_per_step, 3),
                      "conf_per_sec": round(conf_per_sec, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)
