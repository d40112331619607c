"""Shared CLI plumbing: checkpoint resolution + model/config loading."""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Honor AGDIFF_PLATFORM=cpu|tpu|axon for CLI runs. The image's
    sitecustomize force-registers the remote axon backend and overwrites
    jax_platforms even when JAX_PLATFORMS=cpu is exported (see
    .claude/skills/verify/SKILL.md), so an explicit jax.config.update after
    import is the only way a CLI user can run on local CPU."""
    plat = os.environ.get("AGDIFF_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    enable_compilation_cache()


def enable_compilation_cache(logger=None):
    """Point JAX's persistent compilation cache at a per-user disk dir so
    compiled executables survive across processes (the reference has no
    analog — torch eager pays no compile; here a cold generation ladder
    costs minutes, see README serving section).

    Policy: AGDIFF_CACHE_DIR=off disables; AGDIFF_CACHE_DIR=<dir> enables
    anywhere (tests use this on CPU); unset enables at the default path
    only when NOT running on local CPU — XLA:CPU AOT reloads trip
    machine-feature checks and log SIGILL warnings, so CPU stays opt-in.
    Returns the cache dir or None. Safe with backends that cannot
    serialize executables: JAX warns once and compiles normally.

    The default path is REPO-LOCAL (.cache/xla, gitignored): machine
    restarts between rounds wipe ~/.cache but preserve the repo, and a
    cold ladder compile costs ~13 min (BENCH_r03 measured the regression:
    compile_plus_first_s 56 -> 109.5 s after a ~/.cache wipe)."""
    cache = os.environ.get("AGDIFF_CACHE_DIR")
    if cache == "off":
        return None
    if not cache:
        if os.environ.get("AGDIFF_PLATFORM") == "cpu":
            return None
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".cache", "xla")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    # ladder programs all take >>1 s to build; skip trivial host jits
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if logger:
        logger.info(f"persistent compilation cache: {cache}")
    return cache


def load_inference_bundle(ckpt_arg: str, ckpt_iter=None, dtype=None,
                          logger=None, use_ema: bool = False):
    """Resolve a log dir / native checkpoint / reference .pt checkpoint to
    (config, variables, ckpt_path, iteration). The model config travels in
    the checkpoint (reference: scripts/test.py:111); `dtype` overrides the
    compute dtype (bfloat16 sampling of f32-trained models is the fastest
    configuration). use_ema samples with the EMA shadow weights (requires a
    checkpoint trained with config.train.ema_decay > 0)."""
    from agdiff_tpu.train.checkpoint import latest_checkpoint, load_checkpoint

    if os.path.isdir(os.path.join(ckpt_arg, "checkpoints")):
        ckpt_path, it = latest_checkpoint(ckpt_arg, ckpt_iter)
    else:
        ckpt_path, it = ckpt_arg, 0

    if ckpt_path.endswith((".pt", ".pth")):
        # a reference (PyTorch) checkpoint: import the weights directly
        from agdiff_tpu.config import Config
        from agdiff_tpu.train.import_torch import load_reference_checkpoint

        variables, model_config = load_reference_checkpoint(ckpt_path)
        config = Config(model=model_config)
        if use_ema:
            raise ValueError("--ema is not available for imported reference "
                             ".pt checkpoints (no EMA shadow)")
        if logger:
            logger.info("imported reference torch checkpoint")
    else:
        ckpt = load_checkpoint(ckpt_path)
        config = ckpt["config"]
        params = ckpt["params"]
        if use_ema:
            if "ema_params" not in ckpt:
                raise ValueError(
                    f"--ema requested but {ckpt_path} has no EMA shadow "
                    "(train with config.train.ema_decay > 0)")
            params = ckpt["ema_params"]
            if logger:
                logger.info("sampling with EMA weights")
        variables = {"params": params,
                     "batch_stats": ckpt["batch_stats"]}
    if dtype:
        import dataclasses as _dc

        config = _dc.replace(
            config, model=_dc.replace(config.model, dtype=dtype))
    return config, variables, ckpt_path, it
