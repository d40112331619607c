"""Shared NN building blocks: learnable activations, masked batch-norm,
torch-compatible initializers."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from agdiff_tpu.ops.masked import masked_batch_norm_stats


def torch_linear_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default weight init: kaiming_uniform(a=sqrt(5)), which
    reduces to U(+-1/sqrt(fan_in)). Flax kernels are (in, out); fan_in is
    shape[0]."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Linear(nn.Module):
    """Dense layer with torch-default initialization (so training dynamics
    match the reference's torch.nn.Linear layers)."""

    features: int
    use_bias: bool = True
    kernel_init: Any = None
    bias_init: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel_init = self.kernel_init or torch_linear_init
        kernel = self.param("kernel", kernel_init, (fan_in, self.features))
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias_init = self.bias_init or torch_bias_init(fan_in)
            bias = self.param("bias", bias_init, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class ShiftedSoftplus(nn.Module):
    """softplus(beta * x) - log(2) with a learnable scalar beta — AGDIFF's
    "learnable activation" (reference: src/agdiff/models/encoder/schnet.py:71-80).
    """

    @nn.compact
    def __call__(self, x):
        beta = self.param("beta", nn.initializers.ones, ())
        return jax.nn.softplus(beta * x) - jnp.log(2.0).astype(x.dtype)


def activation_by_name(name) -> Callable:
    if name is None or callable(name):
        return name
    table = {
        "relu": jax.nn.relu,
        "gelu": jax.nn.gelu,
        "silu": jax.nn.silu,
        "swish": jax.nn.silu,
        "softplus": jax.nn.softplus,
        "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid,
        "leaky_relu": jax.nn.leaky_relu,
        "elu": jax.nn.elu,
    }
    if name not in table:
        raise ValueError(f"Unknown activation: {name}")
    return table[name]


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over the real nodes of a padded (B, N, C) block.

    Matches torch.nn.BatchNorm1d semantics over the concatenated real nodes of
    a variadic batch (the reference's usage in CFConv schnet.py:119/122 and
    GINEncoder gin.py:108-110): biased variance for normalization, unbiased
    for the running-stat update, momentum 0.1 (new = (1-m)*old + m*batch).
    Padded entries do not contribute to statistics and are zeroed on output.
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool):
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if train:
            mean, var, count = masked_batch_norm_stats(x.astype(jnp.float32), mask)
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps)
        y = (x - mean.astype(x.dtype)) * (inv * scale).astype(x.dtype) + bias.astype(
            x.dtype
        )
        return jnp.where(mask[..., None], y, 0.0)
