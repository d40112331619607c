"""Progressive distillation of the diffusion sampler into a few-step student.

Salimans & Ho, "Progressive Distillation for Fast Sampling of Diffusion
Models" (ICLR 2022), adapted to this model's scaled parameterization: a
student initialized from the teacher learns to make ONE deterministic DDIM
step that lands where TWO consecutive teacher steps land, halving the
sampling ladder per stage (e.g. 64 -> 32 -> 16 -> 8 steps).

This is a capability the reference does not have at all — its sampler is a
fixed 5000-iteration annealed Langevin loop
(/root/reference/src/agdiff/models/epsnet/dualenc.py:441-547; the
sampling_type flag is accepted and ignored, dualenc.py:437-439). Combined
with the real DDIM sampler (sampling/langevin.py) a distilled student is
sampled with the stock generation CLI:

    python -m agdiff_tpu.cli.generate <stage_dir> --sampling_type \
        generalized --eta 0 --ladder strided --n_steps <stage steps>

Design notes (TPU-first):
  * the student regresses the EXACT assembled drift used at sampling time
    (sampling/langevin.assemble_drift: local branch + clip_local, global
    branch gated by global_start_sigma and weighted w_global) — the
    SamplerConfig of the target protocol is baked into the loss;
  * each batch trains ALL ladder levels at once: per-graph random step
    index k, per-graph sigma through the (B,)-broadcasting drift assembly —
    one jit program per stage, no per-level recompiles;
  * the teacher's 2-step rollout runs inside the same jit under
    stop_gradient (3 forwards + 1 backward per iteration, all fused by XLA);
  * positions are NOT re-centered inside the rollout: per-step CoM
    centering at sampling time (langevin.py step) is an idempotent
    projection applied identically to teacher and student trajectories, so
    leaving it out of the target keeps eps_target a pure composition of
    drifts without changing the sampled distribution;
  * loss weight max(1, sigma_i^2) is the truncated-SNR weighting of
    Salimans & Ho sec. 4 expressed in this parameterization (x0-space MSE
    at high noise, eps-space MSE at low noise).

The ladder grid is exactly cli.generate's `--ladder strided` grid
(round(linspace(T-1, 0, n))), so the student is sampled on the grid it was
trained for with no new flags.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from agdiff_tpu.config import Config
from agdiff_tpu.data.graph_batch import GraphBatch
from agdiff_tpu.models.schedules import make_diffusion
from agdiff_tpu.sampling.langevin import SamplerConfig, assemble_drift
from agdiff_tpu.train.optimizer import make_optimizer
from agdiff_tpu.train.train_step import TrainState


class DistillMetrics(NamedTuple):
    loss: jax.Array
    grad_norm: jax.Array


def strided_ladder(num_timesteps: int, n_steps: int) -> np.ndarray:
    """The strided sampling grid — MUST match sampling/langevin.py's
    `ladder='strided'` indices so generation uses the trained grid."""
    return np.round(
        np.linspace(num_timesteps - 1, 0, n_steps)
    ).astype(np.int32)


def ladder_triplets(
    num_timesteps: int, n_student: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(start, mid, next) timestep-index triplets for every student step.

    start[k] -> next[k] is one student DDIM step; start[k] -> mid[k] ->
    next[k] are the two teacher steps it must match. next uses -1 as the
    clean (sigma = 0) sentinel exactly like the sampler's final step.
    The midpoint is the rounded index mean; for the final step
    (start = 0, next = -1) it degenerates to -1, making the second teacher
    sub-step a no-op and the target the teacher's own final drift.
    """
    idx = strided_ladder(num_timesteps, n_student).astype(np.int64)
    nxt = np.concatenate([idx[1:], [-1]])
    mid = (idx + nxt) // 2
    return idx.astype(np.int32), mid.astype(np.int32), nxt.astype(np.int32)


def make_distill_loss(model, config: Config, sampler_cfg: SamplerConfig,
                      n_student: int, weighting: str = "trunc-snr"):
    """The distillation loss
        loss_fn(params, batch_stats, teacher_variables, batch, key) -> scalar
    (module docstring for the math). Shared by the train and eval steps.

    weighting — per-step weight on the eps-space MSE:
      * 'trunc-snr': max(1, sigma_i^2) — Salimans & Ho sec. 4 (x0-MSE at
        high noise, eps-MSE at low noise); with sigma_max ~ 12 on the QM9
        schedule the highest-noise steps carry ~150x weight;
      * 'eps': 1 — uniform in eps space;
      * 'step': (sigma_j - sigma_i)^2 — each step weighted by its actual
        contribution to the endpoint (x-space) error.
    """
    if weighting not in ("trunc-snr", "eps", "step"):
        raise ValueError(f"unknown weighting {weighting!r}")
    diffusion = make_diffusion(config.model)
    sig = jnp.asarray(diffusion.sigmas, jnp.float32)  # (T,)
    start_i, mid_i, next_i = (
        jnp.asarray(a) for a in ladder_triplets(
            diffusion.num_timesteps, n_student)
    )
    cfg = sampler_cfg

    def sigma_of(idx):
        # sigma at timestep index, with -1 = clean (sigma 0)
        return jnp.where(idx >= 0, sig[jnp.maximum(idx, 0)], 0.0)

    def drift(variables, batch, pos, sigma):
        out = model.apply(
            variables, batch.replace(pos=pos), train=False,
            extend_order=cfg.extend_order, extend_radius=cfg.extend_radius,
        )
        return assemble_drift(out, pos, sigma, cfg)

    def loss_fn(params, batch_stats, teacher, batch: GraphBatch, key):
        kkey, nkey = jax.random.split(key)
        B = batch.num_graphs
        k = jax.random.randint(kkey, (B,), 0, n_student)
        s_i = sigma_of(start_i[k])          # (B,)
        s_m = sigma_of(mid_i[k])
        s_j = sigma_of(next_i[k])

        noise = jax.random.normal(nkey, batch.pos.shape, batch.pos.dtype)
        noise = noise * batch.node_mask[..., None]
        pos_i = batch.pos + noise * s_i[:, None, None]

        # teacher: two consecutive DDIM (eta=0) steps, frozen
        eps1 = -drift(teacher, batch, pos_i, s_i)
        pos_m = pos_i + (s_m - s_i)[:, None, None] * eps1
        eps2 = -drift(teacher, batch, pos_m, s_m)
        pos_j = pos_m + (s_j - s_m)[:, None, None] * eps2
        c = s_j - s_i  # < 0 (noise decreases); degenerate pairs guarded
        c = jnp.where(jnp.abs(c) < 1e-12, 1.0, c)
        eps_target = jax.lax.stop_gradient(
            (pos_j - pos_i) / c[:, None, None]
        )

        # student: one step's drift at the same (pos_i, sigma_i)
        eps_s = -drift(
            {"params": params, "batch_stats": batch_stats},
            batch, pos_i, s_i,
        )

        valid = batch.node_mask & batch.graph_mask[:, None]
        w_node = valid.astype(jnp.float32)
        sq = jnp.sum((eps_s - eps_target) ** 2, axis=-1)       # (B, N)
        if weighting == "trunc-snr":
            w = jnp.maximum(1.0, s_i**2)[:, None]
        elif weighting == "step":
            w = jnp.square(s_j - s_i)[:, None]
        else:  # 'eps'
            w = jnp.ones_like(s_i)[:, None]
        count = jnp.maximum(jnp.sum(w_node), 1.0)
        return jnp.sum(sq * w * w_node) / count

    return loss_fn


def make_distill_step(model, config: Config, sampler_cfg: SamplerConfig,
                      n_student: int, donate: bool = True, jit: bool = True,
                      weighting: str = "trunc-snr"):
    """Build the distillation step:
        (state, teacher_variables, batch, key) -> (state, metrics).

    `state` is a TrainState whose params are the student (initialized from
    the teacher); batch_stats stay frozen (the drift runs the model in
    inference mode, matching sampling). teacher_variables is the frozen
    {params, batch_stats} pytree of the stage's teacher — passed as an
    argument (not closed over) so successive stages reuse one executable.
    """
    loss_fn = make_distill_loss(model, config, sampler_cfg, n_student,
                                weighting=weighting)
    tx = make_optimizer(config.train)

    def distill_step(state: TrainState, teacher, batch: GraphBatch, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, state.batch_stats, teacher, batch, key
        )
        grad_norm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        d = config.train.ema_decay  # static
        new_ema = (jax.tree_util.tree_map(
            lambda e, p: d * e + (1.0 - d) * p,
            state.ema_params, new_params,
        ) if d > 0 else state.ema_params)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=state.batch_stats, opt_state=new_opt,
            ema_params=new_ema,
        )
        return new_state, DistillMetrics(loss=loss, grad_norm=grad_norm)

    if not jit:
        return distill_step
    return jax.jit(distill_step, donate_argnums=(0,) if donate else ())


def make_chunked_distill_step(model, config: Config,
                              sampler_cfg: SamplerConfig, n_student: int,
                              chunk: int, donate: bool = True,
                              jit: bool = True,
                              weighting: str = "trunc-snr"):
    """K = chunk distill steps per device dispatch (lax.scan over leading-
    stacked batches) — same dispatch-latency amortization as
    train_step.make_chunked_train_step (the per-program launch through a
    remote tunnel is ~25 ms host-side, CLAUDE round-2 findings)."""
    inner = make_distill_step(model, config, sampler_cfg, n_student,
                              jit=False, weighting=weighting)

    def chunked(state: TrainState, teacher, batches: GraphBatch, key):
        keys = jax.random.split(key, chunk)

        def body(st, xs):
            b, k = xs
            return inner(st, teacher, b, k)

        state, metrics = jax.lax.scan(body, state, (batches, keys))
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return state, last

    if not jit:
        return chunked
    return jax.jit(chunked, donate_argnums=(0,) if donate else ())


def make_distill_eval_step(model, config: Config,
                           sampler_cfg: SamplerConfig, n_student: int,
                           weighting: str = "trunc-snr"):
    """Validation: the distill loss summed over real nodes (mirrors
    train_step.make_eval_step's sums/count contract)."""
    loss_fn = make_distill_loss(model, config, sampler_cfg, n_student,
                                weighting=weighting)

    def eval_step(state: TrainState, teacher, batch: GraphBatch, key):
        loss = loss_fn(state.params, state.batch_stats, teacher, batch, key)
        valid = batch.node_mask & batch.graph_mask[:, None]
        count = jnp.sum(valid.astype(jnp.float32))
        return {"sum_loss": loss * count, "count": count}

    return jax.jit(eval_step)
