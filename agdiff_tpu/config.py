"""Typed configuration system.

The reference uses YAML -> EasyDict with no schema or validation
(reference: scripts/train.py:46-47, configs/qm9_default.yml). Here configs are
frozen dataclasses with YAML load/save, so they are hashable (usable as jit
static args) and serializable into checkpoints (the reference stores the model
config inside the checkpoint and re-reads it at generation time,
scripts/test.py:111 — we preserve that contract).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import yaml


@dataclass(frozen=True)
class ModelConfig:
    """Score-network hyperparameters (reference: configs/qm9_default.yml:1-15)."""

    type: str = "diffusion"  # 'diffusion' | 'dsm' (dsm = legacy, schedule only)
    network: str = "dualenc"
    hidden_dim: int = 128
    num_convs: int = 6            # global (SchNet) interaction blocks
    num_convs_local: int = 4      # local (GIN) convolutions
    cutoff: float = 10.0          # radius-graph cutoff (Angstrom)
    mlp_act: str = "relu"
    beta_schedule: str = "sigmoid"
    beta_start: float = 1.0e-7
    beta_end: float = 2.0e-3
    num_diffusion_timesteps: int = 5000
    edge_order: int = 3           # bond-graph order extension
    edge_encoder: str = "mlp"     # 'mlp' | 'gaussian'
    smooth_conv: bool = False     # cosine (True) vs Gaussian (False) cutoff envelope
    # --- DSM legacy branch (constructed but never trained in the reference,
    # dualenc.py:127-140) ---
    sigma_begin: float = 10.0
    sigma_end: float = 0.01
    num_noise_level: int = 50
    # --- Faithfulness flags for reference quirks (SURVEY.md section 2.6).
    # Defaults replicate reference behaviour exactly. ---
    tie_edge_encoders: bool = True      # dualenc.py:214 uses edge_encoder_global
    #                                     for the local branch too
    edge_attention_mode: str = "softmax_dim1"  # MLPEdgeEncoder attention:
    #   'softmax_dim1' — reference (edge.py:77): softmax over a singleton axis,
    #                    mathematically the identity; computed for parity.
    #   'none'         — skip the (identity) computation; same values, faster.
    #   'sigmoid'      — an actually-functional gate (non-reference extension).
    embedding_max_norm: Optional[float] = 10.0  # schnet.py:254 Embedding max_norm
    # --- Numerics ---
    dtype: str = "float32"        # compute dtype: 'float32' | 'bfloat16'
    # Rematerialize the encoders in backward (training): trades cheap FLOPs
    # for not storing the (B, N, N, C) edge activations. Measured on v5e:
    # remat LOSES (~21 vs ~16 ms/step at B=64) — prefer packed_pairs below.
    remat: bool = False
    # Compute per-edge tensors on the N(N-1)/2 unordered pairs instead of
    # the N^2 dense block (every per-edge quantity is symmetric; BatchNorm
    # is node-space, so values match the dense path — tests/
    # test_packed_train.py). Halves forward per-edge volume AND the
    # residuals the backward saves.
    packed_pairs: bool = False

    @property
    def num_timesteps(self) -> int:
        if self.type == "diffusion":
            return self.num_diffusion_timesteps
        return self.num_noise_level


@dataclass(frozen=True)
class OptimizerConfig:
    """reference: configs/qm9_default.yml:24-29, utils/common.py:54-68."""

    type: str = "adam"
    lr: float = 1.0e-3
    weight_decay: float = 0.0
    beta1: float = 0.95
    beta2: float = 0.999


@dataclass(frozen=True)
class SchedulerConfig:
    """reference: configs/qm9_default.yml:30-33, utils/common.py:71-90."""

    type: str = "plateau"  # 'plateau' | 'expmin' | 'expmin_milestone'
    factor: float = 0.6
    patience: int = 10
    min_lr: float = 0.0
    milestone: int = 1     # for expmin_milestone: gamma = factor^(1/milestone)


@dataclass(frozen=True)
class TrainConfig:
    """reference: configs/qm9_default.yml:17-33."""

    seed: int = 2021
    batch_size: int = 64
    val_freq: int = 5000
    max_iters: int = 1_000_000
    max_grad_norm: float = 10000.0
    anneal_power: float = 2.0
    # Skip parameter updates when gradients are non-finite (production
    # robustness; the reference has no training-time NaN handling — its only
    # guard is the sampler's, dualenc.py:539-541). Off by default for parity.
    skip_nonfinite_updates: bool = False
    # Execute this many optimizer steps per device dispatch (lax.scan over
    # pre-stacked batches). >1 amortizes per-program launch latency — large
    # on a remote-tunneled chip, nonzero everywhere. 1 = reference-style
    # one-step-per-dispatch. Logging/validation cadence rounds to chunks.
    step_chunk: int = 1
    # Exponential moving average of the parameters (an extension — the
    # reference trains/evals raw weights only). 0 = off (reference
    # semantics); 0.999 is the usual diffusion-model setting. The EMA
    # shadow is checkpointed alongside the raw params; cli.generate --ema
    # samples with it.
    ema_decay: float = 0.0
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)


@dataclass(frozen=True)
class DatasetConfig:
    train: Optional[str] = None
    val: Optional[str] = None
    test: Optional[str] = None


@dataclass(frozen=True)
class BucketConfig:
    """Static-shape padding buckets: one XLA program per (max_nodes,) bucket."""

    max_nodes: Tuple[int, ...] = (32, 64)


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    buckets: BucketConfig = field(default_factory=BucketConfig)


def _build(cls, data: Dict[str, Any]):
    """Recursively build a dataclass from a nested dict, ignoring unknown keys."""
    if data is None:
        return cls()
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for key, value in data.items():
        if key not in fields:
            continue  # tolerate reference-config keys we do not use
        ftype = fields[key].type
        nested = {
            "model": ModelConfig,
            "train": TrainConfig,
            "optimizer": OptimizerConfig,
            "scheduler": SchedulerConfig,
            "dataset": DatasetConfig,
            "buckets": BucketConfig,
        }
        if key in nested and isinstance(value, dict):
            kwargs[key] = _build(nested[key], value)
        elif isinstance(value, list):
            kwargs[key] = tuple(value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


def load_config(path: str) -> Config:
    """Load a YAML config file (accepts reference-format YAMLs unchanged)."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    return _build(Config, raw)


def config_from_dict(raw: Dict[str, Any]) -> Config:
    return _build(Config, raw)


def config_to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def config_to_json(cfg: Config) -> str:
    return json.dumps(config_to_dict(cfg))


def config_from_json(s: str) -> Config:
    return _build(Config, json.loads(s))


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(config_to_dict(cfg), f)
