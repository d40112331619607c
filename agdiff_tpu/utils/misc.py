"""Misc utilities (reference: src/agdiff/utils/misc.py)."""

from __future__ import annotations

import random
from typing import Iterable, Iterator

import numpy as np


class BlackHole:
    """Null object absorbing any call/attribute (reference misc.py:14-22)."""

    def __setattr__(self, name, value):
        pass

    def __call__(self, *args, **kwargs):
        return self

    def __getattr__(self, name):
        return self


def seed_all(seed: int) -> None:
    """Seed host RNGs (reference misc.py:55-58; device randomness in JAX is
    explicit via PRNG keys, so there is nothing device-side to seed)."""
    random.seed(seed)
    np.random.seed(seed)


def inf_iterator(iterable: Iterable) -> Iterator:
    """Cycle an iterable forever (reference misc.py:61-67)."""
    while True:
        yield from iterable
