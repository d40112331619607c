"""jit-compiled training / evaluation steps.

Reference training loop: scripts/train.py:117-158 — sample timesteps,
perturb, forward, dual loss, backward, shared grad clip, two optimizer steps.
Here the whole step (including noise sampling) is one jit'd function; the
data-parallel multi-chip variant lives in agdiff_tpu.parallel.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.struct import dataclass as pytree_dataclass

from agdiff_tpu.config import Config
from agdiff_tpu.data.graph_batch import GraphBatch
from agdiff_tpu.models.loss import (
    diffusion_loss,
    perturb_positions,
    sample_timesteps,
)
from agdiff_tpu.models.schedules import make_diffusion
from agdiff_tpu.train.optimizer import make_optimizer


@pytree_dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # EMA shadow of params (config.train.ema_decay > 0), else None — None is
    # an empty pytree subtree, so every transform/sharding path is unchanged
    # when the feature is off.
    ema_params: Any = None


class StepMetrics(NamedTuple):
    loss: jax.Array
    loss_global: jax.Array
    loss_local: jax.Array
    grad_norm: jax.Array


def create_train_state(config: Config, key: jax.Array, max_nodes: int,
                       batch_size: int = 2) -> Tuple[Any, TrainState]:
    """Initialize model variables and optimizer state."""
    from agdiff_tpu.models.dualenc import init_model

    model, variables = init_model(
        config.model, key, max_nodes=max_nodes, batch=batch_size
    )
    tx = make_optimizer(config.train)
    params = variables["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        # tree_map(copy) — aliasing params would make donation see the same
        # buffer twice (f(donate(a), donate(a)))
        ema_params=(jax.tree_util.tree_map(jnp.copy, params)
                    if config.train.ema_decay > 0 else None),
    )
    return model, state


def make_train_step(model, config: Config, donate: bool = True,
                    jit: bool = True):
    """Build the train step: (state, batch, key) -> (state, metrics).
    With jit=False, returns the raw traceable function (used by the
    data-parallel wrapper in agdiff_tpu.parallel)."""
    diffusion = make_diffusion(config.model)
    alphas = jnp.asarray(diffusion.alphas)
    tx = make_optimizer(config.train)
    cutoff = config.model.cutoff

    def loss_fn(params, batch_stats, batch: GraphBatch, key):
        tkey, nkey = jax.random.split(key)
        t = sample_timesteps(tkey, batch.num_graphs, diffusion.num_timesteps)
        pos_p, a = perturb_positions(nkey, batch, alphas, t)
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch.replace(pos=pos_p),
            train=True,
            mutable=["batch_stats"],
        )
        lo = diffusion_loss(out, batch, pos_p, a, cutoff)
        return lo.loss, (lo, mutated["batch_stats"])

    def train_step(state: TrainState, batch: GraphBatch, key):
        (loss, (lo, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, key)
        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        d = config.train.ema_decay  # static: traced away when 0
        new_ema = (jax.tree_util.tree_map(
            lambda e, p: d * e + (1.0 - d) * p,
            state.ema_params, new_params,
        ) if d > 0 else state.ema_params)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        metrics = StepMetrics(
            loss=loss, loss_global=lo.loss_global, loss_local=lo.loss_local,
            grad_norm=grad_norm,
        )
        return new_state, metrics

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_chunked_train_step(model, config: Config, chunk: int,
                            donate: bool = True, jit: bool = True):
    """K = chunk optimizer steps per device dispatch, as one lax.scan over a
    leading-stacked batch pytree (each leaf (K, ...)). One program launch
    per K steps — the per-dispatch latency (large through a remote tunnel,
    nonzero everywhere) amortizes by K. Values are bit-identical to calling
    the single step K times with the same per-step keys.

    Returns (state, stacked_batches, key) -> (state, metrics-of-last-step).
    jit=False returns the raw function (the DP wrapper re-jits with
    shardings, parallel/data_parallel.make_parallel_chunked_train_step).
    """
    inner = make_train_step(model, config, jit=False)

    def chunked(state: TrainState, batches: GraphBatch, key):
        keys = jax.random.split(key, chunk)

        def body(st, xs):
            b, k = xs
            return inner(st, b, k)

        state, metrics = jax.lax.scan(body, state, (batches, keys))
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return state, last

    if not jit:
        return chunked
    return jax.jit(chunked, donate_argnums=(0,) if donate else ())


def stack_batches(batches):
    """Stack a list of same-shape GraphBatch pytrees on a new leading axis
    (host-side collation for the chunked step)."""
    import numpy as np

    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches
    )


def make_eval_step(model, config: Config):
    """Validation step. The reference's validate() runs in model.eval() mode
    (train.py:165 — BatchNorm uses running statistics) and accumulates
    per-node loss sums / counts across the val set (train.py:160-187), which
    is what this returns: (sum_loss, sum_global, sum_local, node_count)."""
    diffusion = make_diffusion(config.model)
    alphas = jnp.asarray(diffusion.alphas)
    cutoff = config.model.cutoff

    def eval_step(state: TrainState, batch: GraphBatch, key):
        tkey, nkey = jax.random.split(key)
        t = sample_timesteps(tkey, batch.num_graphs, diffusion.num_timesteps)
        pos_p, a = perturb_positions(nkey, batch, alphas, t)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch.replace(pos=pos_p),
            train=False,
        )
        lo = diffusion_loss(out, batch, pos_p, a, cutoff)
        valid = batch.node_mask & batch.graph_mask[:, None]
        count = jnp.sum(valid.astype(jnp.float32))
        return {
            "sum_loss": lo.loss * count,
            "sum_global": lo.loss_global * count,
            "sum_local": lo.loss_local * count,
            "count": count,
        }

    return jax.jit(eval_step)
