"""Persistent XLA compilation-cache plumbing (cli/_common.py).

The reference (eager torch) pays no compile step; here every cold process
re-builds minute-scale ladder programs, so executables are cached on disk
across processes. These tests cover the env gating and a real two-process
round trip on CPU.
"""

import os
import subprocess
import sys

import jax

from agdiff_tpu.cli._common import enable_compilation_cache

_SCRIPT = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from agdiff_tpu.cli._common import enable_compilation_cache
d = enable_compilation_cache()
assert d == os.environ["AGDIFF_CACHE_DIR"], d
# the helper's 1 s threshold skips toy compiles; drop it for the test
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
x = jnp.ones((64, 64))
print(float(jax.jit(lambda a: jnp.tanh(a @ a).sum())(x)))
"""


def _reset_cache_config():
    jax.config.update("jax_compilation_cache_dir", None)


def test_gating(tmp_path, monkeypatch):
    try:
        monkeypatch.setenv("AGDIFF_CACHE_DIR", "off")
        assert enable_compilation_cache() is None

        monkeypatch.delenv("AGDIFF_CACHE_DIR", raising=False)
        monkeypatch.setenv("AGDIFF_PLATFORM", "cpu")
        assert enable_compilation_cache() is None

        cache = str(tmp_path / "xla")
        monkeypatch.setenv("AGDIFF_CACHE_DIR", cache)
        assert enable_compilation_cache() == cache
        assert os.path.isdir(cache)
        assert jax.config.jax_compilation_cache_dir == cache
    finally:
        _reset_cache_config()


def test_two_process_roundtrip(tmp_path):
    cache = str(tmp_path / "xla")
    env = dict(os.environ, AGDIFF_CACHE_DIR=cache, AGDIFF_PLATFORM="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    for _ in range(2):  # first populates, second loads the AOT entries
        r = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.listdir(cache), "no cache entries written"
