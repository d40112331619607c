"""Fused Pallas TPU kernels for the sampler hot path.

Why: at bf16 the forward is HBM-bandwidth bound — the (B, N, N, C) edge
tensors are materialized to HBM and re-read by every consumer (12 convs + 2
pair MLPs per step: profiled ~13% MXU utilization). These kernels keep a
GROUP of graphs' (G, N, N, C) edge blocks in VMEM and fuse the per-edge
compute with the aggregation, so each consumer writes only its (G, N, F) or
(G, N, N) result:

  * pair_score_mlp — score_ij = MLP(concat(h_i * h_j, e_ij)); replaces
    materializing h_pair (B, N, N, 2C) + 3 matmuls (reference semantics:
    common.py:106-109 + the grad dist MLPs, dualenc.py:88-98).
  * interaction_block_aggregate — BOTH CFConv pathways of an
    InteractionBlock: per-edge scalar weights (DistanceWeightingNetwork x
    cutoff envelope x mask, schnet.py:136-149) + filter MLP (Linear ->
    learnable shifted-softplus -> Linear), aggregated against node features
    (schnet.py:156-162), one edge_attr read per block, no (B, N, N, F)
    filter tensor in HBM.
  * gine_aggregate — sum_j mask_ij * act(x_j + e_ij) (gin.py:65-69) without
    materializing the (B, N, N, H) messages.

Tiling: the grid runs over graph GROUPS (default 8 graphs per program), so
the in-kernel matmuls are (G*N*N, C) x (C, F) — full MXU tiles — and the
grid is short enough to pipeline DMA with compute. One-graph-per-program
tiling measured ~25% slower than plain XLA; grouped tiling is the usable
configuration. Mosaic constraint honored throughout: reshapes never change
the minor (lane) dimension.

Kernels are eval-path only (used by the sampler); training uses the XLA
path (autodiff-friendly).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU
import os as _os

DEFAULT_GROUP = int(_os.environ.get("AGDIFF_PALLAS_GROUP", "8"))

LN2 = 0.6931471805599453


def pallas_available() -> bool:
    """TPU (or interpret mode) available for these kernels."""
    if _INTERPRET:
        return True
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _act(name: str) -> Callable:
    return {"relu": jax.nn.relu, "gelu": jax.nn.gelu,
            "softplus": jax.nn.softplus, "tanh": jnp.tanh}[name]


def _group_of(b: int, group: int) -> int:
    g = min(group, b)
    while b % g:
        g -= 1
    return g


def _wspec(arr):
    return pl.BlockSpec(arr.shape, lambda i: tuple([0] * arr.ndim),
                        memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# pair_score_mlp
# ---------------------------------------------------------------------------

def _pair_score_kernel(h_ref, e_ref, mask_ref, w1h_ref, w1e_ref, b1_ref,
                       w2_ref, b2_ref, w3_ref, b3_ref, out_ref, *, g, n, c,
                       activation):
    act = _act(activation)
    h = h_ref[:]                            # (G, N, C)
    e = e_ref[:].reshape(g * n * n, c)      # minor dim preserved
    prod = (h[:, :, None, :] * h[:, None, :, :]).reshape(g * n * n, c)
    x = (
        jnp.dot(prod, w1h_ref[:].astype(h.dtype),
                preferred_element_type=jnp.float32)
        + jnp.dot(e, w1e_ref[:].astype(e.dtype),
                  preferred_element_type=jnp.float32)
        + b1_ref[:]
    )
    x = act(x)
    y = act(jnp.dot(x.astype(w2_ref.dtype), w2_ref[:],
                    preferred_element_type=jnp.float32) + b2_ref[:])
    # final (H2 -> 1) layer as an elementwise reduce (a (X, 1) matmul would
    # change the lane dim)
    s = jnp.sum(y * w3_ref[:][:, 0][None, :], axis=-1) + b3_ref[0]
    score = s.reshape(g, n, n)
    out_ref[:] = jnp.where(mask_ref[:] != 0, score, 0.0)


def pair_score_mlp(h, edge_attr, edge_mask, w1, b1, w2, b2, w3, b3,
                   activation: str = "relu", group: int = DEFAULT_GROUP):
    """score[b, i, j] = MLP3(concat(h_bi * h_bj, e_bij)), zeroed off-mask.

    w1: (2C, H1) — top half multiplies h_i*h_j, bottom half e_ij (the concat
    layout); w2: (H1, H2); w3: (H2, 1). Returns (B, N, N) float32.
    """
    b, n, c = h.shape
    g = _group_of(b, group)
    w1h, w1e = w1[:c], w1[c:]
    kernel = functools.partial(
        _pair_score_kernel, g=g, n=n, c=c, activation=activation
    )
    vm = pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, n, c), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((g, n, n, c), lambda i: (i, 0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((g, n, n), lambda i: (i, 0, 0), memory_space=vm),
            _wspec(w1h), _wspec(w1e), _wspec(b1), _wspec(w2), _wspec(b2),
            _wspec(w3), _wspec(b3),
        ],
        out_specs=pl.BlockSpec((g, n, n), lambda i: (i, 0, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((b, n, n), jnp.float32),
        interpret=_INTERPRET,
    )(h, edge_attr, edge_mask.astype(jnp.int32), w1h, w1e, b1, w2, b2, w3, b3)


# ---------------------------------------------------------------------------
# gine_aggregate
# ---------------------------------------------------------------------------

def _gine_kernel(x_ref, e_ref, mask_ref, out_ref, *, activation):
    act = _act(activation)
    # compute in f32 regardless of storage dtype (bf16 middle-axis reduces
    # fail Mosaic layout inference; the HBM traffic stays bf16)
    x = x_ref[:].astype(jnp.float32)       # (G, N, C)
    e = e_ref[:].astype(jnp.float32)       # (G, N, N, C)
    msg = act(x[:, None, :, :] + e)        # msg[g, i, j] = act(x_j + e_ij)
    msg = msg * mask_ref[:][:, :, :, None].astype(jnp.float32)
    out_ref[:] = jnp.sum(msg, axis=2)


def gine_aggregate(x, edge_attr, local_mask, activation: str = "relu",
                   group: int = DEFAULT_GROUP):
    """agg[b, i] = sum_j mask_bij * act(x_bj + e_bij) without materializing
    the (B, N, N, C) message tensor in HBM (reference: gin.py:65-69)."""
    b, n, c = x.shape
    g = _group_of(b, group)
    kernel = functools.partial(_gine_kernel, activation=activation)
    vm = pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, n, c), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((g, n, n, c), lambda i: (i, 0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((g, n, n), lambda i: (i, 0, 0), memory_space=vm),
        ],
        out_specs=pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        interpret=_INTERPRET,
    )(x, edge_attr, local_mask.astype(x.dtype))


# ---------------------------------------------------------------------------
# interaction_block_aggregate
# ---------------------------------------------------------------------------

def _block_agg_kernel(e_ref, w1_ref, w2_ref, h1_ref, h2_ref,
                      fa1_ref, ba1_ref, fb1_ref, bb1_ref,
                      fa2_ref, ba2_ref, fb2_ref, bb2_ref,
                      scalars_ref,  # SMEM: [beta1, beta2]
                      out1_ref, out2_ref, *, g, n, c, f1, f2,
                      softplus_fn=jax.nn.softplus):
    beta1 = scalars_ref[0, 0]
    beta2 = scalars_ref[0, 1]
    e = e_ref[:].reshape(g * n * n, c)

    def pathway(w_edge, fa, ba, beta, fb, bb, h, f, out_ref):
        w = jnp.dot(e, fa[:].astype(e.dtype),
                    preferred_element_type=jnp.float32) + ba[:]
        w = softplus_fn(beta * w) - LN2
        w = jnp.dot(w.astype(e.dtype), fb[:].astype(e.dtype),
                    preferred_element_type=jnp.float32) + bb[:]
        w = w.reshape(g, n, n, f) * w_edge[:][..., None]
        out_ref[:] = jnp.sum(w * h[:][:, None, :, :], axis=2)

    pathway(w1_ref, fa1_ref, ba1_ref, beta1, fb1_ref, bb1_ref, h1_ref, f1,
            out1_ref)
    pathway(w2_ref, fa2_ref, ba2_ref, beta2, fb2_ref, bb2_ref, h2_ref, f2,
            out2_ref)


def interaction_block_aggregate(
    edge_attr, w_edge1, w_edge2, h1, h2,
    conv1, conv2,  # dicts with fa, ba, beta, fb, bb
    group: int = DEFAULT_GROUP,
    softplus_fn: Callable = jax.nn.softplus,
):
    """Fused dual-pathway interaction aggregation: one edge_attr read per
    block. The per-edge scalar weights w_edge = DistanceWeightingNetwork x
    cutoff envelope x mask (schnet.py:136-149) are computed by the caller in
    XLA — they are (B, N, N) and cheap; the tiny 1->32->1 MLP violates
    Mosaic's lane-layout rules in-kernel. Returns (agg1, agg2)."""
    b, n, _, c = edge_attr.shape
    f1m = h1.shape[-1]
    f2m = h2.shape[-1]
    g = _group_of(b, group)
    scalars = jnp.stack([
        conv1["beta"].astype(jnp.float32).reshape(()),
        conv2["beta"].astype(jnp.float32).reshape(()),
    ]).reshape(1, 2)
    kernel = functools.partial(_block_agg_kernel, g=g, n=n, c=c, f1=f1m,
                               f2=f2m, softplus_fn=softplus_fn)
    vm = pltpu.VMEM
    args = [
        edge_attr, w_edge1, w_edge2, h1, h2,
        conv1["fa"][0], conv1["fa"][1], conv1["fb"][0], conv1["fb"][1],
        conv2["fa"][0], conv2["fa"][1], conv2["fb"][0], conv2["fb"][1],
        scalars,
    ]
    in_specs = [
        pl.BlockSpec((g, n, n, c), lambda i: (i, 0, 0, 0), memory_space=vm),
        pl.BlockSpec((g, n, n), lambda i: (i, 0, 0), memory_space=vm),
        pl.BlockSpec((g, n, n), lambda i: (i, 0, 0), memory_space=vm),
        pl.BlockSpec((g, n, f1m), lambda i: (i, 0, 0), memory_space=vm),
        pl.BlockSpec((g, n, f2m), lambda i: (i, 0, 0), memory_space=vm),
    ] + [_wspec(a) for a in args[5:13]] + [
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((g, n, f1m), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((g, n, f2m), lambda i: (i, 0, 0), memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, f1m), jnp.float32),
            jax.ShapeDtypeStruct((b, n, f2m), jnp.float32),
        ),
        interpret=_INTERPRET,
    )(*args)
