"""Whole-stack packed-pair SchNet kernel: all interaction blocks in VMEM.

The per-block packed kernel (ops/pallas/block_packed.py) is ~3x faster
than the XLA block in isolation (136.5 vs 420 us/block, round-4
block_probe) yet LOSES in-sampler (0.95x fast-slim): six kernel
dispatches per step serialize against the remaining XLA segments and
re-materialize their (B, N, F) node inputs/outputs + re-read the
(B, P, C) packed edge features at every block boundary — ~45 us/block
of pure I/O by the pk-noagg/pk-nomlp ablation algebra.

This kernel removes the boundaries instead of the blocks: ONE
`pallas_call` runs the ENTIRE interaction stack (reference hot loop:
src/agdiff/models/schnet.py:122-226 — the per-block filter MLPs,
dual-pathway CFConv aggregation, node MLPs, attention gate, SE gate and
residual) for a tile of G graphs:

  * the packed edge features (B, P, C) are read from HBM ONCE and stay
    VMEM-resident for all `num_convs` blocks (the per-block engine reads
    them 6x);
  * the node state h is carried ACROSS blocks in registers/VMEM — no
    per-block (B, N, F) HBM round-trips;
  * per block it reuses the measured-fastest v5 aggregation: both convs'
    filter tensors lane-concatenated into one (P, F1+F2) stream and
    aggregated with the STACKED one-hot endpoint selectors,
    agg = [EI^T | EJ^T]([t; t] * ([EJ; EI] x)), two MXU dots per graph;
  * the node-side block math (lin1/lin2, shifted-softplus, combination
    linear, attention gate, SE scaling, residual) runs in-kernel on the
    tiny (G*N, F) tensors — its transcendental volume is N/P ~= 1/16th
    of the filter path's, so exposing it to the VPU is cheap.

The distance-weight x envelope x mask scalar planes stay XLA-side
(computing them in-kernel measured +129 us/block, round-4 pk-nodw
ablation) and arrive stacked as one (2*NB, B, P) tensor.

Everything in the body is 2-D (g*p, C)/(g*n, F)-shaped between the
3-D block reads — Mosaic on this toolchain rejects lane-dim-changing
reshapes, and collapsing leading axes preserves the lane dim. Eval-path
only (the sampler); training keeps the autodiff-friendly XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from agdiff_tpu.ops.pallas.block_packed import _selectors
from agdiff_tpu.ops.pallas.fused import _group_of, _wspec

_INTERPRET = False  # flipped by tests on CPU

LN2 = 0.6931471805599453


def _leaky(x):
    return jnp.where(x > 0, x, 0.2 * x)


def _stack_kernel(ep_ref, we_ref, h0_ref, exp_ref, con_ref,
                  fa1_ref, ba1_ref, fb1_ref, bb1_ref,
                  fa2_ref, ba2_ref, fb2_ref, bb2_ref,
                  l1a_k_ref, l1a_b_ref, l1b_k_ref, l1b_b_ref,
                  l2a_k_ref, l2a_b_ref, l2b_k_ref, l2b_b_ref,
                  lin_k_ref, lin_b_ref, att0_k_ref, att0_b_ref,
                  att1_k_ref, att1_b_ref, se0_ref, se1_ref,
                  scalars_ref,  # SMEM (NB, 3): [beta1, beta2, act_beta]
                  out_ref, *, nb, g, p, n, c,
                  softplus_fn=jax.nn.softplus,
                  sigmoid_fn=jax.nn.sigmoid):
    ep = ep_ref[:].reshape(g * p, c)      # lane dim preserved
    cd = ep.dtype                          # MXU compute dtype
    e_exp = exp_ref[:]                     # (2P, N) stacked [EJ; EI]
    e_con = con_ref[:]                     # (N, 2P) stacked [EI^T | EJ^T]
    h = h0_ref[:].reshape(g * n, h0_ref.shape[-1]).astype(jnp.float32)

    def dot(x, w):
        return jnp.dot(x.astype(cd), w.astype(cd),
                       preferred_element_type=jnp.float32)

    for blk in range(nb):
        beta1 = scalars_ref[blk, 0]
        beta2 = scalars_ref[blk, 1]
        act_beta = scalars_ref[blk, 2]

        # node inputs of both convs (CFConv lin1 + leaky_relu)
        x1 = _leaky(dot(h, l1a_k_ref[blk]) + l1a_b_ref[blk])   # (g*n, F1)
        x2 = _leaky(dot(h, l1b_k_ref[blk]) + l1b_b_ref[blk])   # (g*n, F2)
        x_cat = jnp.concatenate([x1, x2], axis=-1).astype(jnp.float32)

        # filter MLPs on the packed pairs, scaled by the per-pair plane
        def filters(fa, ba, beta, fb, bb, we):
            v = dot(ep, fa) + ba
            v = softplus_fn(beta * v) - LN2
            t = dot(v, fb) + bb
            # 3-D multiply against the (g, p) plane (a (g*p, 1) reshape
            # would change the lane dim), then collapse back to 2-D
            t = t.reshape(g, p, t.shape[-1]) * we[..., None]
            return t.reshape(g * p, t.shape[-1])

        t1 = filters(fa1_ref[blk], ba1_ref[blk], beta1,
                     fb1_ref[blk], bb1_ref[blk], we_ref[2 * blk])
        t2 = filters(fa2_ref[blk], ba2_ref[blk], beta2,
                     fb2_ref[blk], bb2_ref[blk], we_ref[2 * blk + 1])
        f1 = t1.shape[-1]
        t_cat = jnp.concatenate([t1, t2], axis=-1)             # (g*p, F1+F2)

        # merged-stream endpoint aggregation, two MXU dots per graph
        outs = []
        for gi in range(g):
            tg = t_cat[gi * p:(gi + 1) * p]
            tg2 = jnp.concatenate([tg, tg], axis=0)            # (2P, F1+F2)
            xg = x_cat[gi * n:(gi + 1) * n]
            xij = jnp.dot(e_exp, xg, preferred_element_type=jnp.float32)
            outs.append(jnp.dot(e_con, tg2 * xij,
                                preferred_element_type=jnp.float32))
        a = jnp.concatenate(outs, axis=0)                      # (g*n, F1+F2)

        # node-side block math (InteractionBlock tail + SE gate)
        p1 = dot(a[:, :f1], l2a_k_ref[blk]) + l2a_b_ref[blk]
        p2 = dot(a[:, f1:], l2b_k_ref[blk]) + l2b_b_ref[blk]
        comb = jnp.concatenate([p1, p2], axis=-1)
        comb = softplus_fn(act_beta * comb) - LN2
        comb = dot(comb, lin_k_ref[blk]) + lin_b_ref[blk]
        gate = jax.nn.relu(dot(comb, att0_k_ref[blk]) + att0_b_ref[blk])
        gate = sigmoid_fn(dot(gate, att1_k_ref[blk]) + att1_b_ref[blk])
        out = comb * gate
        out = out * sigmoid_fn(dot(jax.nn.relu(dot(out, se0_ref[blk])),
                                   se1_ref[blk]))
        h = h + out

    out_ref[:] = h.reshape(g, n, h.shape[-1])


def packed_stack_forward(e_packed, we, h0, blocks, group: int = 8,
                         softplus_fn=jax.nn.softplus,
                         sigmoid_fn=jax.nn.sigmoid,
                         vmem_limit_bytes: int = 96 * 1024 * 1024):
    """Run the full interaction stack on packed pairs as ONE kernel.

    e_packed: (B, P, C) edge features on the triu pair set. we: (2*NB, B, P)
    f32 per-pair scalar planes (distance weight x envelope x edge mask),
    ordered [blk0 conv1, blk0 conv2, blk1 conv1, ...] — zero on padded or
    invalid pairs, which keeps padded nodes' aggregates at exactly 0.
    h0: (B, N, H) f32 initial node embedding. blocks: the folded per-block
    dicts from fast_forward.fold_eval_params. Returns h_final (B, N, H) f32.
    """
    b, p, c = e_packed.shape
    n = h0.shape[1]
    nb = len(blocks)
    assert we.shape == (2 * nb, b, p), (we.shape, nb, b, p)
    assert p == n * (n - 1) // 2, (p, n)
    g = _group_of(b, group)
    e_exp, e_con = _selectors(n)

    def stk(path):
        return jnp.stack([path(blk) for blk in blocks])

    def bias(path):
        # biases kept 2-D per block — ref[blk] then yields (1, F), which
        # broadcasts over rows (Mosaic 1-D slices are less reliable)
        return jnp.stack([path(blk).reshape(1, -1) for blk in blocks])

    scalars = jnp.stack([
        jnp.stack([blk["convs"][0]["beta"].astype(jnp.float32).reshape(()),
                   blk["convs"][1]["beta"].astype(jnp.float32).reshape(()),
                   blk["act_beta"].astype(jnp.float32).reshape(())])
        for blk in blocks
    ])  # (NB, 3)

    args = [
        e_packed, we, h0, e_exp, e_con,
        stk(lambda bk: bk["convs"][0]["fa"][0]),
        bias(lambda bk: bk["convs"][0]["fa"][1]),
        stk(lambda bk: bk["convs"][0]["fb"][0]),
        bias(lambda bk: bk["convs"][0]["fb"][1]),
        stk(lambda bk: bk["convs"][1]["fa"][0]),
        bias(lambda bk: bk["convs"][1]["fa"][1]),
        stk(lambda bk: bk["convs"][1]["fb"][0]),
        bias(lambda bk: bk["convs"][1]["fb"][1]),
        stk(lambda bk: bk["convs"][0]["lin1"][0]),
        bias(lambda bk: bk["convs"][0]["lin1"][1]),
        stk(lambda bk: bk["convs"][1]["lin1"][0]),
        bias(lambda bk: bk["convs"][1]["lin1"][1]),
        stk(lambda bk: bk["convs"][0]["lin2"][0]),
        bias(lambda bk: bk["convs"][0]["lin2"][1]),
        stk(lambda bk: bk["convs"][1]["lin2"][0]),
        bias(lambda bk: bk["convs"][1]["lin2"][1]),
        stk(lambda bk: bk["lin"][0]),
        bias(lambda bk: bk["lin"][1]),
        stk(lambda bk: bk["att0"][0]),
        bias(lambda bk: bk["att0"][1]),
        stk(lambda bk: bk["att1"][0]),
        bias(lambda bk: bk["att1"][1]),
        stk(lambda bk: bk["se0"]),
        stk(lambda bk: bk["se1"]),
        scalars,
    ]
    f = h0.shape[-1]
    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((g, p, c), lambda i: (i, 0, 0), memory_space=vm),
        pl.BlockSpec((2 * nb, g, p), lambda i: (0, i, 0), memory_space=vm),
        pl.BlockSpec((g, n, f), lambda i: (i, 0, 0), memory_space=vm),
    ] + [_wspec(a) for a in args[3:-1]] + [
        pl.BlockSpec(scalars.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    kernel = functools.partial(_stack_kernel, nb=nb, g=g, p=p, n=n, c=c,
                               softplus_fn=softplus_fn,
                               sigmoid_fn=sigmoid_fn)
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, n, f), lambda i: (i, 0, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((b, n, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=_INTERPRET,
    )(*args)
