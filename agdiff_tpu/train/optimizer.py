"""Optimizers and LR scheduling.

The reference trains with TWO independent Adam optimizers over disjoint
parameter partitions — model_global = {edge_encoder_global, encoder_global,
grad_global_dist_mlp} and model_local = {edge_encoder_local, encoder_local,
grad_local_dist_mlp} (reference: scripts/train.py:96-100, dualenc.py:103-108)
— with one shared gradient-norm clip over ALL parameters (train.py:136), and
a ReduceLROnPlateau schedule per optimizer driven by validation loss
(utils/common.py:71-90, configs: factor 0.6, patience 10).

TPU-native equivalent: optax.chain(clip_by_global_norm, multi_transform) with
the partition decided by the top-level module name, and per-partition
learning rates injected via optax.inject_hyperparams so the host-side plateau
controller can update them without rebuilding the optimizer.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax

from agdiff_tpu.config import OptimizerConfig, SchedulerConfig, TrainConfig

GLOBAL = "global"
LOCAL = "local"

_LOCAL_PREFIXES = (
    "edge_encoder_local",
    "encoder_local",
    "grad_local_dist_mlp",
    # tied-encoder layout: the single edge encoder is the *global* one
    # (reference quirk, dualenc.py:214); everything else defaults to global.
)


def param_partition(params) -> Any:
    """Label each leaf 'global' or 'local' by its top-level module name."""

    def label_for(top: str) -> str:
        return LOCAL if any(top.startswith(p) for p in _LOCAL_PREFIXES) else GLOBAL

    return {k: jax.tree_util.tree_map(lambda _: label_for(k), v)
            for k, v in params.items()}


def _adam(opt: OptimizerConfig, lr: float):
    tx = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr, b1=opt.beta1, b2=opt.beta2, eps=1e-8
    )
    if opt.weight_decay:
        tx = optax.chain(optax.add_decayed_weights(opt.weight_decay), tx)
    return tx


def make_optimizer(train_cfg: TrainConfig) -> optax.GradientTransformation:
    """Full optimizer: shared global-norm clip, then partitioned Adams."""
    opt = train_cfg.optimizer
    if opt.type != "adam":
        raise NotImplementedError(opt.type)
    tx = optax.chain(
        optax.clip_by_global_norm(train_cfg.max_grad_norm),
        optax.multi_transform(
            {GLOBAL: _adam(opt, opt.lr), LOCAL: _adam(opt, opt.lr)},
            param_labels=param_partition,
        ),
    )
    if getattr(train_cfg, "skip_nonfinite_updates", False):
        # wrap so steps with inf/nan gradients become no-ops (after
        # max_consecutive_errors the wrapper passes them through to surface
        # the failure rather than silently stalling)
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx


def _unwrap(opt_state):
    """Peel an optax.apply_if_finite wrapper if present."""
    if hasattr(opt_state, "inner_state") and hasattr(opt_state, "notfinite_count"):
        return opt_state.inner_state, True
    return opt_state, False


def set_learning_rates(opt_state, lr_global: float, lr_local: float):
    """Update the injected learning rates inside the optimizer state."""
    inner, wrapped = _unwrap(opt_state)
    clip_state, multi_state = inner
    inner = dict(multi_state.inner_states)
    for name, lr in ((GLOBAL, lr_global), (LOCAL, lr_local)):
        masked = inner[name]
        hp_state = masked.inner_state
        new_hp = hp_state._replace(
            hyperparams={**hp_state.hyperparams,
                         "learning_rate": jnp.asarray(lr, jnp.float32)}
        )
        inner[name] = masked._replace(inner_state=new_hp)
    new_inner = (clip_state, multi_state._replace(inner_states=inner))
    if wrapped:
        return opt_state._replace(inner_state=new_inner)
    return new_inner


def get_learning_rates(opt_state) -> Tuple[float, float]:
    inner, _ = _unwrap(opt_state)
    _, multi_state = inner
    out = []
    for name in (GLOBAL, LOCAL):
        hp = multi_state.inner_states[name].inner_state.hyperparams
        out.append(float(hp["learning_rate"]))
    return tuple(out)


# --- host-side ReduceLROnPlateau controller (torch semantics:
# mode='min', new_lr = lr * factor after `patience` epochs without
# improvement; reference utils/common.py:75-81) ---


@dataclass(frozen=True)
class PlateauState:
    lr: float
    best: float = float("inf")
    num_bad: int = 0


def plateau_init(lr: float) -> PlateauState:
    return PlateauState(lr=lr)


def plateau_update(
    state: PlateauState, metric: float, sched: SchedulerConfig,
    threshold: float = 1e-4,
) -> PlateauState:
    """One validation-metric observation; returns the new state (lr may
    decay). torch default threshold mode is 'rel' with threshold=1e-4."""
    if metric < state.best * (1.0 - threshold):
        return replace(state, best=metric, num_bad=0)
    num_bad = state.num_bad + 1
    if num_bad > sched.patience:
        new_lr = max(state.lr * sched.factor, sched.min_lr)
        return PlateauState(lr=new_lr, best=state.best, num_bad=0)
    return replace(state, num_bad=num_bad)


def scheduler_step(
    state: PlateauState, metric: float, sched: SchedulerConfig
) -> PlateauState:
    """One scheduler step, dispatched on sched.type — called once per
    validation epoch, as the reference does (train.py:189-194):
      plateau           — ReduceLROnPlateau on the metric;
      expmin            — lr = max(lr * factor, min_lr)
                          (ExponentialLR_with_minLr, utils/common.py:11-38);
      expmin_milestone  — same with gamma = factor^(1/milestone)
                          (utils/common.py:83-89).
    """
    if sched.type == "plateau":
        return plateau_update(state, metric, sched)
    if sched.type == "expmin":
        return replace(state, lr=max(state.lr * sched.factor, sched.min_lr))
    if sched.type == "expmin_milestone":
        import math

        gamma = math.exp(math.log(sched.factor) / max(sched.milestone, 1))
        return replace(state, lr=max(state.lr * gamma, sched.min_lr))
    raise NotImplementedError(f"Scheduler not supported: {sched.type}")
