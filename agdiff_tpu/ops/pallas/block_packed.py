"""Packed-pair fused interaction block: filter MLP + aggregation in VMEM.

The HLO traffic breakdown (tools/hlo_traffic.py, round 4) showed the
fast-slim step's HBM bytes are dominated by the packed->dense mirror
gathers of the CFConv filter tensors — (B, N^2, F) materializations plus
the pure layout copies feeding them — written and re-read once per conv
per block (reference hot loop: src/agdiff/models/schnet.py:122-162).

This kernel removes the mirrors entirely: for a TILE of G graphs it

  1. runs both convs' filter MLPs (Linear -> learnable shifted-softplus ->
     Linear) on the PACKED unordered pairs (B, P, C), P = N(N-1)/2 — the
     filter is symmetric in (i, j) because edge_attr is;
  2. multiplies the per-pair scalar weights (DistanceWeightingNetwork x
     cutoff envelope x edge mask) passed as (B, P) planes — computed by
     the caller in packed space, where XLA fuses the tiny scalar MLPs to
     near-zero traffic; computing them in-kernel measured +129 us/block
     of exposed VPU work (tools/block_probe.py pk-nodw ablation);
  3. aggregates straight from packed pairs to nodes with the STACKED
     static one-hot endpoint selectors as two per-graph MXU matmuls:

         agg = [EI^T | EJ^T] ( [t; t] * ([EJ; EI] x) )

     i.e. expansion (2P, N) @ (N, F) and contraction (N, 2P) @ (2P, F)
     — exactly ops/pairs.py's endpoint-selector identity
     (agg[i] = sum_j w[pair(i,j)] * x[j]), with the i/j halves fused into
     single dots (4 -> 2 dots per graph per conv; the per-graph form
     avoids the monolithic kernel's block-diagonal FLOP blowup).

Nothing (B, N, N, F)-shaped ever touches HBM: per block the kernel reads
e_packed (B, P, C) + two (B, P) scalar planes + the two (B, N, F) node
inputs and writes the two (B, N, F) aggregates. Eval-path only (the
sampler); training keeps the autodiff-friendly XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from agdiff_tpu.ops.pallas.fused import _group_of, _wspec

_INTERPRET = False  # flipped by tests on CPU

LN2 = 0.6931471805599453


def _packed_block_kernel(ep_ref, we1_ref, we2_ref, x1_ref, x2_ref,
                         exp_ref, con_ref,
                         fa1_ref, ba1_ref, fb1_ref, bb1_ref,
                         fa2_ref, ba2_ref, fb2_ref, bb2_ref,
                         scalars_ref,  # SMEM: [beta1, beta2]
                         out1_ref, out2_ref, *, g, p, c,
                         softplus_fn=jax.nn.softplus):
    beta1 = scalars_ref[0, 0]
    beta2 = scalars_ref[0, 1]
    ep = ep_ref[:].reshape(g * p, c)  # minor (lane) dim preserved
    e_exp = exp_ref[:]   # (2P, N) stacked one-hot [EJ; EI]
    e_con = con_ref[:]   # (N, 2P) stacked transpose [EI^T | EJ^T]

    def filters(we_ref, fa, ba, beta, fb, bb):
        v = jnp.dot(ep, fa[:].astype(ep.dtype),
                    preferred_element_type=jnp.float32) + ba[:]
        v = softplus_fn(beta * v) - LN2
        t = jnp.dot(v.astype(ep.dtype), fb[:].astype(ep.dtype),
                    preferred_element_type=jnp.float32) + bb[:]
        return t.reshape(g, p, t.shape[-1]) * we_ref[:][..., None]

    t1 = filters(we1_ref, fa1_ref, ba1_ref, beta1, fb1_ref, bb1_ref)
    t2 = filters(we2_ref, fa2_ref, ba2_ref, beta2, fb2_ref, bb2_ref)
    f1 = t1.shape[-1]
    # one aggregation stream for BOTH conv pathways: lane-concat the filter
    # tensors (F1 + F2 = 192 lanes) and the node inputs, so each graph
    # needs only 2 MXU dots + 1 multiply + 1 sublane concat (per-op
    # overhead dominated the unmerged form, tools/block_probe.py)
    t = jnp.concatenate([t1, t2], axis=-1)               # (G, P, F1+F2)
    x = jnp.concatenate([x1_ref[:], x2_ref[:]],
                        axis=-1).astype(jnp.float32)     # (G, N, F1+F2)
    for gi in range(g):
        tg2 = jnp.concatenate([t[gi], t[gi]], axis=0)    # (2P, F1+F2)
        xij = jnp.dot(e_exp, x[gi], preferred_element_type=jnp.float32)
        o = jnp.dot(e_con, tg2 * xij,
                    preferred_element_type=jnp.float32)  # (N, F1+F2)
        out1_ref[gi] = o[:, :f1]
        out2_ref[gi] = o[:, f1:]


@functools.lru_cache(maxsize=None)
def _selectors(n: int):
    """Stacked one-hot endpoint selectors as NUMPY constants (jnp arrays
    must not be cached across jit traces): expansion [EJ; EI] (2P, N) and
    contraction [EI^T | EJ^T] (N, 2P)."""
    iu, ju = np.triu_indices(n, k=1)
    p = len(iu)
    ei = np.zeros((p, n), np.float32)
    ej = np.zeros((p, n), np.float32)
    ei[np.arange(p), iu] = 1.0
    ej[np.arange(p), ju] = 1.0
    e_exp = np.concatenate([ej, ei], axis=0)
    e_con = np.concatenate([ei, ej], axis=0).T
    return e_exp, np.ascontiguousarray(e_con)


def packed_block_aggregate(e_packed, we1, we2, x1, x2, conv1, conv2,
                           group: int = 8,
                           softplus_fn=jax.nn.softplus,
                           vmem_limit_bytes: int = 64 * 1024 * 1024):
    """Both CFConv pathways of one interaction block from packed pairs.

    e_packed: (B, P, C) edge features on the triu pair set (ops/pairs.py
    order). we1/we2: (B, P) f32 per-pair scalar weights (distance weight x
    envelope x edge mask — zero on padded/invalid pairs, which is what
    keeps padded nodes' aggregates at exactly 0). x1/x2: (B, N, F) node
    inputs (node_input of each conv). conv dicts as folded by
    fast_forward.fold_eval_params. Returns (agg1, agg2) f32 (B, N, F)."""
    b, p, c = e_packed.shape
    n = x1.shape[1]
    assert p == n * (n - 1) // 2, (p, n)
    f1 = conv1["fb"][0].shape[1]
    f2 = conv2["fb"][0].shape[1]
    g = _group_of(b, group)
    e_exp, e_con = _selectors(n)
    scalars = jnp.stack([
        conv1["beta"].astype(jnp.float32).reshape(()),
        conv2["beta"].astype(jnp.float32).reshape(()),
    ]).reshape(1, 2)
    kernel = functools.partial(_packed_block_kernel, g=g, p=p, c=c,
                               softplus_fn=softplus_fn)
    vm = pltpu.VMEM
    args = [
        e_packed, we1, we2, x1, x2, e_exp, e_con,
        conv1["fa"][0], conv1["fa"][1], conv1["fb"][0], conv1["fb"][1],
        conv2["fa"][0], conv2["fa"][1], conv2["fb"][0], conv2["fb"][1],
        scalars,
    ]
    in_specs = [
        pl.BlockSpec((g, p, c), lambda i: (i, 0, 0), memory_space=vm),
        pl.BlockSpec((g, p), lambda i: (i, 0), memory_space=vm),
        pl.BlockSpec((g, p), lambda i: (i, 0), memory_space=vm),
        pl.BlockSpec((g, n, f1), lambda i: (i, 0, 0), memory_space=vm),
        pl.BlockSpec((g, n, f2), lambda i: (i, 0, 0), memory_space=vm),
    ] + [_wspec(a) for a in args[5:15]] + [
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((g, n, f1), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((g, n, f2), lambda i: (i, 0, 0), memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, f1), jnp.float32),
            jax.ShapeDtypeStruct((b, n, f2), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=_INTERPRET,
    )(*args)
