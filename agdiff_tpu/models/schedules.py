"""Diffusion noise schedules.

Reference: src/agdiff/models/epsnet/dualenc.py:21-51 (get_beta_schedule) and
112-140 (buffers). Schedules are computed in float64 on the host (as the
reference does via numpy) and stored as float32 constants; `alphas` follows
the reference's naming and is actually the cumulative product alpha-bar.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def get_beta_schedule(
    beta_schedule: str, *, beta_start: float, beta_end: float,
    num_diffusion_timesteps: int,
) -> np.ndarray:
    """Beta schedules: quad / linear / const / jsd / sigmoid (float64)."""
    T = num_diffusion_timesteps
    if beta_schedule == "quad":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, T, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, T, dtype=np.float64)
    elif beta_schedule == "const":
        betas = beta_end * np.ones(T, dtype=np.float64)
    elif beta_schedule == "jsd":  # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(T, 1, T, dtype=np.float64)
    elif beta_schedule == "sigmoid":
        x = np.linspace(-6, 6, T)
        betas = 1.0 / (1.0 + np.exp(-x)) * (beta_end - beta_start) + beta_start
    else:
        raise NotImplementedError(beta_schedule)
    assert betas.shape == (T,)
    return betas


@dataclass(frozen=True)
class Diffusion:
    """Precomputed schedule constants (host numpy; convert at use sites)."""

    betas: np.ndarray        # (T,) float32
    alphas: np.ndarray       # (T,) float32 — cumprod(1 - beta), i.e. alpha-bar
    num_timesteps: int

    @property
    def sigmas(self) -> np.ndarray:
        """sqrt(1 - a) / sqrt(a) — the annealing ladder used by the sampler
        (reference: dualenc.py:468)."""
        return np.sqrt(1.0 - self.alphas) / np.sqrt(self.alphas)


def make_diffusion(config) -> Diffusion:
    if config.type == "diffusion":
        betas64 = get_beta_schedule(
            config.beta_schedule,
            beta_start=config.beta_start,
            beta_end=config.beta_end,
            num_diffusion_timesteps=config.num_diffusion_timesteps,
        )
        # match reference: betas cast to float32 first, cumprod in float32
        betas = betas64.astype(np.float32)
        alphas = np.cumprod(1.0 - betas, dtype=np.float32)
        return Diffusion(betas=betas, alphas=alphas, num_timesteps=len(betas))
    if config.type == "dsm":
        # legacy geometric sigma ladder (constructed but never trained in the
        # reference, dualenc.py:127-140)
        sigmas = np.exp(
            np.linspace(
                np.log(config.sigma_begin), np.log(config.sigma_end),
                config.num_noise_level,
            )
        ).astype(np.float32)
        alphas = 1.0 / (1.0 + sigmas**2)  # so that sigmas == sqrt(1-a)/sqrt(a)
        return Diffusion(
            betas=sigmas, alphas=alphas.astype(np.float32),
            num_timesteps=len(sigmas),
        )
    raise ValueError(f"Unknown model type: {config.type}")
