"""Checkpointing with orbax.

Logical contents mirror the reference checkpoints (scripts/train.py:218-231):
{config, model params (+batch_stats), optimizer state, plateau scheduler
states, iteration, avg_val_loss}, saved under <logdir>/checkpoints/<iter> with
a best_model copy; generation reads the model config out of the checkpoint so
runs are self-describing (scripts/test.py:111). Resume discovers the latest
iteration in the directory (reference utils/misc.py:101-108).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from agdiff_tpu.config import Config, config_from_json, config_to_json
from agdiff_tpu.train.optimizer import PlateauState


def _ckpt_dir(log_dir: str) -> str:
    return os.path.join(os.path.abspath(log_dir), "checkpoints")


def save_checkpoint(
    log_dir: str,
    iteration: int,
    config: Config,
    state,  # TrainState
    plateau_global: PlateauState,
    plateau_local: PlateauState,
    avg_val_loss: float,
    best: bool = False,
) -> str:
    path = os.path.join(_ckpt_dir(log_dir), str(iteration))
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
    }
    if state.ema_params is not None:
        # EMA extension (config.train.ema_decay > 0): the shadow weights
        # travel in the checkpoint; absent otherwise so the on-disk format
        # is unchanged for reference-parity training
        payload["ema_params"] = state.ema_params
    meta = {
        "config": config_to_json(config),
        "iteration": iteration,
        "avg_val_loss": float(avg_val_loss),
        "plateau_global": dataclasses.asdict(plateau_global),
        "plateau_local": dataclasses.asdict(plateau_local),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"), payload, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    if best:
        best_dir = os.path.join(os.path.abspath(log_dir), "best_model")
        os.makedirs(best_dir, exist_ok=True)
        with open(os.path.join(best_dir, "POINTER"), "w") as f:
            f.write(path)
    return path


def latest_checkpoint(log_dir: str, it: Optional[int] = None) -> Tuple[str, int]:
    """Find the checkpoint path for iteration `it` (or the latest).
    Reference: utils/misc.py:101-108 get_checkpoint_path."""
    d = _ckpt_dir(log_dir)
    iters = sorted(int(name) for name in os.listdir(d) if name.isdigit())
    if not iters:
        raise FileNotFoundError(f"no checkpoints in {d}")
    chosen = it if it is not None else iters[-1]
    if chosen not in iters:
        raise FileNotFoundError(f"iteration {chosen} not found in {d}")
    return os.path.join(d, str(chosen)), chosen


def load_checkpoint(path: str, target=None) -> Dict[str, Any]:
    """Load a checkpoint saved by save_checkpoint. Returns
    {params, batch_stats, opt_state, step, config, iteration, avg_val_loss,
    plateau_global, plateau_local}. If `target` (a TrainState) is given, the
    pytree structure/shardings are restored to match it."""
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        payload_target = {
            "params": target.params,
            "batch_stats": target.batch_stats,
            "opt_state": target.opt_state,
            "step": np.asarray(target.step),
        }
        if getattr(target, "ema_params", None) is not None:
            payload_target["ema_params"] = target.ema_params
        payload = ckptr.restore(os.path.join(path, "state"), payload_target)
    else:
        # No target: restore as host numpy arrays so checkpoints are portable
        # across backends (a CPU-saved checkpoint must load in a TPU process
        # and vice versa; orbax would otherwise try to restore onto the
        # devices recorded at save time).
        from etils import epath

        state_path = epath.Path(os.path.abspath(os.path.join(path, "state")))
        handler = ocp.PyTreeCheckpointHandler()
        meta = handler.metadata(state_path)
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta
        )
        payload = handler.restore(
            state_path, args=ocp.args.PyTreeRestore(restore_args=restore_args)
        )
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return {
        **payload,
        "config": config_from_json(meta["config"]),
        "iteration": meta["iteration"],
        "avg_val_loss": meta["avg_val_loss"],
        "plateau_global": PlateauState(**meta["plateau_global"]),
        "plateau_local": PlateauState(**meta["plateau_local"]),
    }


def load_best(log_dir: str, target=None) -> Dict[str, Any]:
    with open(os.path.join(log_dir, "best_model", "POINTER")) as f:
        return load_checkpoint(f.read().strip(), target)
