"""Profiling and tracing hooks.

The reference has no profiling story (SURVEY.md section 5: vestigial
`import time` / tqdm only). TPU-native observability:
  * `trace(log_dir)` — context manager around jax.profiler for device
    traces viewable in TensorBoard/Perfetto;
  * `Timer` — host-side phase timing with jax.block_until_ready semantics;
  * `device_memory_stats()` — live HBM usage where the backend exposes it.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with trace('logs/profile'): step()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock phase timer that waits for device work.

    with Timer() as t:
        out = step(...)
        t.block_on(out)
    print(t.elapsed)
    """

    def __enter__(self):
        self.start = time.perf_counter()
        self.elapsed = None
        return self

    def block_on(self, pytree):
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, pytree,
        )

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        return False


def device_memory_stats(device=None) -> Optional[Dict[str, int]]:
    """bytes_in_use / peak_bytes_in_use etc., if the backend reports them."""
    device = device or jax.devices()[0]
    try:
        return device.memory_stats()
    except Exception:
        return None
