"""Host-side training loop: logging, validation, plateau LR control,
checkpointing, resume.

Mirrors reference scripts/train.py:23-260 semantics: infinite iterator over
shuffled batches, per-iteration metrics logging, validation every val_freq
iterations driving two ReduceLROnPlateau controllers (global branch stepped
on the global loss, local on the local loss — train.py:189-191), checkpoint
each validation with best-model tracking, graceful KeyboardInterrupt exit.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp

from agdiff_tpu.config import Config
from agdiff_tpu.data.dataset import BucketedLoader, ConformationDataset, prefetch
from agdiff_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from agdiff_tpu.train.optimizer import (
    plateau_init,
    scheduler_step,
    set_learning_rates,
)
from agdiff_tpu.train.train_step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from agdiff_tpu.utils.logging import (MetricsWriter, MultiWriter,
                                      TensorBoardWriter, get_logger)


class Trainer:
    def __init__(
        self,
        config: Config,
        train_set: ConformationDataset,
        val_set: Optional[ConformationDataset],
        log_dir: str,
        logger: Optional[logging.Logger] = None,
        mesh=None,
        log_freq: int = 100,
    ):
        self.config = config
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.logger = logger or get_logger("train", log_dir)
        self.writer = MultiWriter(
            MetricsWriter(os.path.join(log_dir, "metrics.jsonl")),
            TensorBoardWriter(log_dir),  # reference train.py:152-158
        )
        self.mesh = mesh
        self.log_freq = log_freq

        buckets = config.buckets.max_nodes
        needed = train_set.max_num_nodes()
        if needed > max(buckets):
            buckets = tuple(sorted(set(buckets) | {needed}))
        self.train_loader = BucketedLoader(
            train_set, config.train.batch_size, buckets,
            edge_order=config.model.edge_order, seed=config.train.seed,
        )
        self.val_loader = (
            BucketedLoader(
                val_set, config.train.batch_size, buckets,
                edge_order=config.model.edge_order, seed=config.train.seed,
                shuffle=False, drop_last=False,
            )
            if val_set is not None
            else None
        )

        key = jax.random.PRNGKey(config.train.seed)
        self.key, init_key = jax.random.split(key)
        self.model, self.state = create_train_state(
            config, init_key, max_nodes=max(buckets),
            batch_size=config.train.batch_size,
        )
        if mesh is not None:
            from agdiff_tpu.parallel.data_parallel import make_parallel_train_step

            self.train_step = make_parallel_train_step(self.model, config, mesh)
        else:
            self.train_step = make_train_step(self.model, config)
        self.eval_step = make_eval_step(self.model, config)

        lr = config.train.optimizer.lr
        self.plateau_global = plateau_init(lr)
        self.plateau_local = plateau_init(lr)
        self.start_iter = 1
        self.best_val_loss = float("inf")

    # --- resume (reference: train.py:104-115) ---
    def resume(self, resume_dir: str, it: Optional[int] = None) -> None:
        path, iteration = latest_checkpoint(resume_dir, it)
        self.logger.info("Resuming from: %s (iteration %d)", path, iteration)
        ckpt = load_checkpoint(path, target=self.state)
        self.state = TrainState(
            step=jnp.asarray(ckpt["step"]),
            params=ckpt["params"],
            batch_stats=ckpt["batch_stats"],
            opt_state=ckpt["opt_state"],
            ema_params=ckpt.get("ema_params"),
        )
        self.plateau_global = ckpt["plateau_global"]
        self.plateau_local = ckpt["plateau_local"]
        self.best_val_loss = ckpt["avg_val_loss"]
        self.start_iter = iteration + 1

    def _apply_lrs(self):
        self.state = TrainState(
            step=self.state.step,
            params=self.state.params,
            batch_stats=self.state.batch_stats,
            opt_state=set_learning_rates(
                self.state.opt_state, self.plateau_global.lr,
                self.plateau_local.lr,
            ),
            ema_params=self.state.ema_params,
        )

    def validate(self, it: int) -> float:
        assert self.val_loader is not None
        sums = {"sum_loss": 0.0, "sum_global": 0.0, "sum_local": 0.0, "count": 0.0}
        self.key, key = jax.random.split(self.key)
        for k, (_, batch) in enumerate(self.val_loader.epoch_batches()):
            out = self.eval_step(self.state, batch, jax.random.fold_in(key, k))
            for name in sums:
                sums[name] += float(out[name])
        avg = sums["sum_loss"] / max(sums["count"], 1.0)
        avg_global = sums["sum_global"] / max(sums["count"], 1.0)
        avg_local = sums["sum_local"] / max(sums["count"], 1.0)

        sched = self.config.train.scheduler
        # global scheduler steps on the global loss, local on the local
        # (reference train.py:189-191); non-plateau types ignore the metric
        self.plateau_global = scheduler_step(self.plateau_global, avg_global, sched)
        self.plateau_local = scheduler_step(self.plateau_local, avg_local, sched)
        self._apply_lrs()

        self.logger.info(
            "[Validate] Iter %05d | Loss %.6f | Loss(Global) %.6f | "
            "Loss(Local) %.6f", it, avg, avg_global, avg_local,
        )
        self.writer.write(
            it, {"val/loss": avg, "val/loss_global": avg_global,
                 "val/loss_local": avg_local},
        )
        return avg

    def train(self, max_iters: Optional[int] = None) -> TrainState:
        cfg = self.config.train
        max_iters = max_iters or cfg.max_iters
        # step_chunk > 1: run K optimizer steps per device dispatch
        # (lax.scan), amortizing per-program launch latency — single-device
        # AND data-parallel (the sharded chunk scans over the K axis with
        # the graph axis sharded). Only groups of same-bucket batches chunk;
        # mixed groups fall back to single steps.
        chunk = max(1, int(cfg.step_chunk))
        data = prefetch(iter(self.train_loader), size=max(2, 2 * chunk))
        shard_one = None
        if self.mesh is not None:
            from agdiff_tpu.parallel.data_parallel import shard_graph_batch

            shard_one = lambda b: shard_graph_batch(b, self.mesh)
        chunked_step = None
        if chunk > 1:
            from agdiff_tpu.train.train_step import (
                make_chunked_train_step,
                stack_batches,
            )

            if self.mesh is not None:
                from agdiff_tpu.parallel.data_parallel import (
                    make_parallel_chunked_train_step,
                    shard_stacked_batches,
                )

                par_chunked = make_parallel_chunked_train_step(
                    self.model, self.config, chunk, self.mesh
                )
                chunked_step = lambda st, stacked, k: par_chunked(
                    st, shard_stacked_batches(stacked, self.mesh), k
                )
            else:
                chunked_step = make_chunked_train_step(
                    self.model, self.config, chunk
                )
        t_start = time.time()
        try:
            it = self.start_iter
            while it <= max_iters:
                k = min(chunk, max_iters - it + 1)
                group = [next(data) for _ in range(k)]
                if chunked_step is not None and k == chunk and len(
                    {bucket for bucket, _ in group}
                ) == 1:
                    stacked = stack_batches([b for _, b in group])
                    self.key, gkey = jax.random.split(self.key)
                    self.state, metrics = chunked_step(
                        self.state, stacked, gkey
                    )
                else:
                    for _, batch in group:
                        if shard_one is not None:
                            batch = shard_one(batch)
                        self.key, step_key = jax.random.split(self.key)
                        self.state, metrics = self.train_step(
                            self.state, batch, step_key
                        )
                prev, it = it, it + k - 1
                if it // self.log_freq != (prev - 1) // self.log_freq \
                        or prev == 1:
                    loss = float(metrics.loss)
                    self.logger.info(
                        "[Train] Iter %05d | Loss %.2f | Loss(Global) %.2f | "
                        "Loss(Local) %.2f | Grad %.2f | LR(Global) %.6f | "
                        "LR(Local) %.6f | %.1f it/s",
                        it, loss, float(metrics.loss_global),
                        float(metrics.loss_local), float(metrics.grad_norm),
                        self.plateau_global.lr, self.plateau_local.lr,
                        self.log_freq / max(time.time() - t_start, 1e-9),
                    )
                    t_start = time.time()
                    self.writer.write(
                        it,
                        {"train/loss": loss,
                         "train/loss_global": float(metrics.loss_global),
                         "train/loss_local": float(metrics.loss_local),
                         "train/grad_norm": float(metrics.grad_norm),
                         "train/lr_global": self.plateau_global.lr,
                         "train/lr_local": self.plateau_local.lr},
                    )
                if (
                    self.val_loader is not None
                    and (it // cfg.val_freq != (prev - 1) // cfg.val_freq
                         or it == max_iters)
                ):
                    avg_val_loss = self.validate(it)
                    best = avg_val_loss < self.best_val_loss
                    if best:
                        self.best_val_loss = avg_val_loss
                        self.logger.info(
                            "New best model saved with loss %f", avg_val_loss
                        )
                    save_checkpoint(
                        self.log_dir, it, self.config, self.state,
                        self.plateau_global, self.plateau_local,
                        avg_val_loss, best=best,
                    )
                it += 1
        except KeyboardInterrupt:
            self.logger.info("Terminating...")
        return self.state
