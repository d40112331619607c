"""Polynomial/rational approximations of the hot transcendentals.

Built to test the round-2 hypothesis that the per-step forward is
VPU-transcendental-bound — and the test REFUTED it: the `approx` engines
measure a wash (0.96x fast-xla, bf16 B=128 N=32), and the stronger
identity-activation bound (tools/probe_act_bound.py — all activations
replaced by x) moves ms/step by only 0.3%. XLA's own exp/log/tanh
expansions hide behind the step's matmul/bandwidth structure. The module
stays because the approximations are quality-safe (sub-bf16-noise, tested)
and the engines (`approx`/`tight-approx` in models/fast_forward.py,
models/tight_forward.py) document the negative result; training and the
parity paths always use the exact activations.
Reference hot loop these feed: src/agdiff/models/epsnet/dualenc.py:478-545
(ShiftedSoftplus filters schnet.py:71-80, sigmoid gates/distance weighting
schnet.py:83-108, gelu edge encoder edge.py:52-78).

Accuracy (max abs error over the full real line, validated by
tests/test_approx.py):
  softplus  1.9e-4      sigmoid  6.8e-4
  tanh      1.4e-3      gelu     2.5e-3 (vs exact-erf gelu; most of it is
                                  the tanh-form's own bias)
bf16 has ~3 significant decimal digits (eps 2^-8 = 3.9e-3), so every
approximation is below the serving dtype's quantization noise. Acceptance
for the engines is protocol quality (MAT-R on a trained model), not bit
parity — see tools/ab_engines.py and the README engine matrix.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# degree-8 Chebyshev fit of g(t) = log1p(exp(-t)) on t in [0, 8]
# (power-basis coefficients, ascending). Fit error 1.45e-4; truncating g
# to poly(8) ~= 1.9e-4 beyond t=8 adds < 3.4e-4 (g(8) = 3.35e-4).
_SOFTPLUS_TAIL = np.array([
    6.93209096e-01, -5.00341100e-01, 1.24495898e-01, 3.08196131e-03,
    -9.28887060e-03, 2.42865434e-03, -3.09991317e-04, 2.03902123e-05,
    -5.52531068e-07,
])

_GELU_C = 0.7978845608028654  # sqrt(2/pi)


def softplus(x):
    """max(x,0) + poly(min(|x|,8)) ~= log1p(exp(x)). ~12 cheap VPU ops
    (abs, min, 8 FMA, max, add) vs the exact exp+log1p expansion."""
    x32 = x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
    t = jnp.minimum(jnp.abs(x32), 8.0)
    acc = jnp.full_like(t, _SOFTPLUS_TAIL[-1])
    for c in _SOFTPLUS_TAIL[-2::-1]:
        acc = acc * t + c
    out = jnp.maximum(x32, 0.0) + acc
    return out.astype(x.dtype)


def tanh(x):
    """Odd Padé [5/4] continued-fraction tanh, clamped: max err 1.4e-3."""
    x32 = x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
    y = jnp.clip(x32, -4.0, 4.0)
    y2 = y * y
    r = y * (945.0 + 105.0 * y2 + y2 * y2) / (
        945.0 + 420.0 * y2 + 15.0 * y2 * y2)
    return jnp.clip(r, -1.0, 1.0).astype(x.dtype)


def sigmoid(x):
    """0.5 * (1 + tanh(x/2)) with the rational tanh: max err 6.8e-4."""
    return (0.5 * (1.0 + tanh(x * 0.5))).astype(x.dtype)


def gelu(x):
    """tanh-form gelu with the rational tanh: max err 2.5e-3 vs erf gelu."""
    x32 = x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
    inner = _GELU_C * (x32 + 0.044715 * x32 * x32 * x32)
    out = 0.5 * x32 * (1.0 + tanh(inner))
    return out.astype(x.dtype)


def relu(x):
    """Exact (already a single VPU op); present so activation tables can
    map every name through this module."""
    return jnp.maximum(x, 0)
