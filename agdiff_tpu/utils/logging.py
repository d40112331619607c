"""Logging and metrics (reference: src/agdiff/utils/misc.py:25-52 get_logger /
get_new_log_dir; TensorBoard scalars train.py:152-158 are replaced by a
dependency-free JSONL metrics stream that TensorBoard-equivalent tooling or
pandas can consume)."""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional


def get_logger(name: str, log_dir: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False  # avoid duplicate lines via the root logger
    if logger.handlers:
        return logger
    formatter = logging.Formatter(
        "[%(asctime)s::%(name)s::%(levelname)s] %(message)s"
    )
    stream = logging.StreamHandler()
    stream.setLevel(logging.DEBUG)
    stream.setFormatter(formatter)
    logger.addHandler(stream)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    return logger


def get_new_log_dir(root: str = "./logs", prefix: str = "", tag: str = "") -> str:
    """Timestamped run directory (reference misc.py:44-52)."""
    fn = time.strftime("%Y_%m_%d__%H_%M_%S", time.localtime())
    if prefix:
        fn = prefix + "_" + fn
    if tag:
        fn = fn + "_" + tag
    log_dir = os.path.join(root, fn)
    os.makedirs(log_dir, exist_ok=True)
    return log_dir


class MetricsWriter:
    """Append-only JSONL scalar stream: {"step": n, "k": v, ...} per line."""

    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        if self._f is None:
            return
        self._f.write(json.dumps({"step": step, **scalars}) + "\n")
        self._f.flush()

    def close(self):
        if self._f:
            self._f.close()


class TensorBoardWriter:
    """Optional TensorBoard event-file output alongside the JSONL stream —
    the one observable the reference has (scripts/train.py:152-158) that the
    JSONL writer alone doesn't replicate. Import-guarded: silently inactive
    when the tensorboard package is absent."""

    def __init__(self, log_dir: Optional[str]):
        self._w = None
        if not log_dir:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter
        except ImportError:
            return
        self._w = SummaryWriter(log_dir)

    @property
    def active(self) -> bool:
        return self._w is not None

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        if self._w is None:
            return
        for k, v in scalars.items():
            self._w.add_scalar(k, v, step)
        self._w.flush()

    def close(self):
        if self._w:
            self._w.close()


class MultiWriter:
    """Fan a scalar stream out to several writers (JSONL + TensorBoard)."""

    def __init__(self, *writers):
        self.writers = [w for w in writers if w is not None]

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        for w in self.writers:
            w.write(step, scalars)

    def close(self):
        for w in self.writers:
            w.close()
