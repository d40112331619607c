"""Decompose training-step time on TPU (VERDICT item 5 groundwork).

Times, in ONE process (comparable readings): forward loss only,
value_and_grad, the full train step, and the remat variant of each; f32
(the real training dtype) at B=64 N=32 QM9 size. Prints one JSON line per
variant.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from agdiff_tpu.config import Config, ModelConfig, TrainConfig
from agdiff_tpu.data.bucketing import pad_molecules
from agdiff_tpu.data.synthetic import synthetic_dataset
from agdiff_tpu.models.loss import (diffusion_loss, perturb_positions,
                                    sample_timesteps)
from agdiff_tpu.models.schedules import make_diffusion
from agdiff_tpu.train.train_step import create_train_state, make_train_step

B, N = 64, 32
mols = synthetic_dataset(B, seed=0, min_heavy=7, max_heavy=9)
batch = pad_molecules(mols, N, batch_size=B)


def timeit(fn, *args):
    """Pipelined timing: dispatch K calls back-to-back, sync once — the
    per-call device_get would measure the ~25 ms host dispatch round-trip
    through the remote-chip tunnel instead of device time."""
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    K = 10
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        times.append((time.perf_counter() - t0) / K)
    return min(times)


VARIANTS = [
    dict(remat=False, dtype="float32", packed_pairs=False),
    dict(remat=False, dtype="bfloat16", packed_pairs=False),
    dict(remat=False, dtype="float32", packed_pairs=True),
    dict(remat=False, dtype="bfloat16", packed_pairs=True),
    dict(remat=True, dtype="float32", packed_pairs=False),
]
import os
if os.environ.get("PROFILE_PACKED_ONLY"):
    VARIANTS = [v for v in VARIANTS if v["packed_pairs"]]

for variant in VARIANTS:
    if True:
        remat, dtype = variant["remat"], variant["dtype"]
        cfg = Config(model=ModelConfig(**variant),
                     train=TrainConfig(batch_size=B))
        model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                          max_nodes=N, batch_size=B)
        diffusion = make_diffusion(cfg.model)
        alphas = jnp.asarray(diffusion.alphas)

        def loss_fn(params, key):
            tkey, nkey = jax.random.split(key)
            t = sample_timesteps(tkey, batch.num_graphs,
                                 diffusion.num_timesteps)
            pos_p, a = perturb_positions(nkey, batch, alphas, t)
            out, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch.replace(pos=pos_p), train=True,
                mutable=["batch_stats"])
            return diffusion_loss(out, batch, pos_p, a, cfg.model.cutoff).loss

        fwd = jax.jit(loss_fn)
        vag = jax.jit(jax.value_and_grad(loss_fn))
        step = make_train_step(model, cfg, donate=False)
        key = jax.random.PRNGKey(1)
        t_f = timeit(fwd, state.params, key)
        t_g = timeit(vag, state.params, key)
        t_s = timeit(step, state, batch, key)
        print(json.dumps({
            "remat": remat, "dtype": dtype,
            "packed_pairs": variant["packed_pairs"],
            "fwd_ms": round(t_f * 1e3, 2),
            "grad_ms": round(t_g * 1e3, 2),
            "step_ms": round(t_s * 1e3, 2),
            "steps_per_sec": round(1.0 / t_s, 2),
        }), flush=True)
