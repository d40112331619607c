"""Whole-forward packed-pair kernel: interaction stack (+GIN, +scores) in VMEM.

The per-block packed kernel (ops/pallas/block_packed.py) is ~3x faster
than the XLA block in isolation (136.5 vs 420 us/block, round-4
block_probe) yet LOSES in-sampler (0.95x fast-slim): six kernel
dispatches per step serialize against the remaining XLA segments and
re-materialize their (B, N, F) node inputs/outputs + re-read the
(B, P, C) packed edge features at every block boundary — ~45 us/block
of pure I/O by the pk-noagg/pk-nomlp ablation algebra.

This kernel removes the boundaries instead of the blocks. ONE
`pallas_call` runs, per tile of G graphs, up to the ENTIRE per-step
forward after the edge encoder (reference hot path:
src/agdiff/models/schnet.py:122-226 + dualenc.py:187-260), in three
nested modes:

  mode='schnet'  the full interaction stack — per block the filter MLPs
                 on the packed pairs, the merged-stream one-hot endpoint
                 aggregation (agg = [EI^T|EJ^T]([t;t] * ([EJ;EI]x)), two
                 MXU dots per graph — the measured-fastest v5 form), and
                 the node-side tail (lin1/lin2, shifted-softplus,
                 combination linear, attention gate, SE gate, residual).
                 h is carried ACROSS blocks in VMEM; e_packed is read
                 from HBM once instead of once per block.
  mode='gin'     + the GIN local branch: per layer the packed message
                 relu(m * (hl_j + e_ij)) (m in {0,1} commutes with relu)
                 aggregated with the same stacked selectors, then the
                 GINE node MLP and residual. Removes the (B, N^2, H)
                 GIN message mirror and its per-layer re-reads (~0.28
                 GB/step of the 'pks' XLA residual, tools/hlo_traffic).
  mode='full'    + both pair-score MLP heads on the packed pairs
                 (prod = (EI h) * (EJ h) exact one-hot endpoint rows,
                 first matmul split across the [prod | e] concat as in
                 fast_forward.pair_scores_packed). The kernel then
                 outputs ONLY the two (B, P) packed score planes — node
                 states never touch HBM at all, and the XLA residual
                 shrinks to the edge encoder + scalar planes + step math.

All MXU contractions run at the engine compute dtype (bf16 in
production) with f32 accumulators — the same arithmetic the slim XLA
path performs (its bf16-stored mirrors make every aggregation a
bf16 x bf16 dot) — so f32 configs remain module-equal to
accumulation-order noise. The distance-weight x envelope x mask scalar
planes stay XLA-side (computing them in-kernel measured +129 us/block,
round-4 pk-nodw ablation) and arrive stacked as one (2*NB, B, P) f32
tensor. Everything in the body is 2-D between 3-D block reads — Mosaic
on this toolchain rejects lane-dim-changing reshapes, and collapsing or
re-expanding leading axes preserves the lane dim. Eval-path only (the
sampler); training keeps the autodiff-friendly XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from agdiff_tpu.ops.pallas.block_packed import _selectors
from agdiff_tpu.ops.pallas.fused import _wspec

_INTERPRET = False  # flipped by tests on CPU
# graphs per grid program. 16 measured 1.058x over 8 at the QM9 point
# (1.676 vs 1.774 ms/step, same-process 250-step ladders, round 5):
# halving the grid halves the per-program re-fetch of the stacked weight
# blocks. Value-identical to any other grouping — each graph's math is
# independent — so the quality gates carry over unchanged.
GROUP_DEFAULT = 16
# SPLIT_AGG: compute the CFConv aggregation as two half-dots per graph
# (a = EI^T(t*EJx) + EJ^T(t*EI x)) instead of materializing the doubled
# [t;t] and [EJx;EI x] (g, 2P, FW) tensors and one wide contract. Same
# FLOPs, same f32 intermediates; the K-sum splits 992 -> 2x496 so values
# differ only by f32 accumulation order. Removes two (g, 2P, FW) VMEM
# materializations per block. MEASURED NEGATIVE (round 5,
# tools/probe_stack_split.py, QM9 point): 1.753 vs 1.664 ms/step =
# 0.949x — the 2g small per-graph dots lose more to MXU tiling than the
# doubled VMEM materializations cost. Keep False.
SPLIT_AGG = False

LN2 = 0.6931471805599453

MODES = ("schnet", "gin", "full")


def _leaky(x):
    return jnp.where(x > 0, x, 0.2 * x)


def _stack_group(b: int, group: int) -> int:
    """Largest group size <= `group` that divides the batch AND yields a
    Mosaic-legal (2*NB, g, P) we-plane block: the middle block dim must be
    divisible by 8 or equal the full array dim (the g=4 probe failed
    lowering on exactly this). Falls back to one whole-batch program."""
    g = min(group, b)
    while g > 0:
        if b % g == 0 and (g % 8 == 0 or g == b):
            return g
        g -= 1
    return b


def _stack_kernel(*refs, nb, nl, g, p, n, c, mode,
                  softplus_fn=jax.nn.softplus,
                  sigmoid_fn=jax.nn.sigmoid,
                  act_fn=jax.nn.relu):
    it = iter(refs)

    def take(k=1):
        return next(it) if k == 1 else [next(it) for _ in range(k)]

    ep_ref, we_ref, h0_ref = take(3)
    if mode != "schnet":
        epl_ref, lm_ref, hl0_ref = take(3)
    exp_ref, con_ref = take(2)
    (fa1_ref, ba1_ref, fb1_ref, bb1_ref,
     fa2_ref, ba2_ref, fb2_ref, bb2_ref,
     l1a_k_ref, l1a_b_ref, l1b_k_ref, l1b_b_ref,
     l2a_k_ref, l2a_b_ref, l2b_k_ref, l2b_b_ref,
     lin_k_ref, lin_b_ref, att0_k_ref, att0_b_ref,
     att1_k_ref, att1_b_ref, se0_ref, se1_ref) = take(24)
    if mode != "schnet":
        g0k_ref, g0b_ref, g1k_ref, g1b_ref = take(4)
    if mode == "full":
        (sg_w1h_ref, sg_w1e_ref, sg_b1_ref, sg_w2_ref, sg_b2_ref,
         sg_w3_ref, sl_w1h_ref, sl_w1e_ref, sl_b1_ref, sl_w2_ref,
         sl_b2_ref, sl_w3_ref) = take(12)
    scalars_ref = take()          # SMEM (NB+1, 3)
    if mode == "schnet":
        out_h_ref = take()
    elif mode == "gin":
        out_h_ref, out_hl_ref = take(2)
    else:
        out_sg_ref, out_sl_ref = take(2)

    ep = ep_ref[:].reshape(g * p, c)      # lane dim preserved
    cd = ep.dtype                          # MXU compute dtype
    e_exp = exp_ref[:]                     # (2P, N) stacked [EJ; EI]
    e_con = con_ref[:]                     # (N, 2P) stacked [EI^T | EJ^T]
    f = h0_ref.shape[-1]
    h = h0_ref[:].reshape(g * n, f).astype(jnp.float32)

    def dot(x, w):
        return jnp.dot(x.astype(cd), w.astype(cd),
                       preferred_element_type=jnp.float32)

    def expand(x2d, width):
        # per-graph expansion dots: rows (x_j; x_i) for every pair, via
        # the stacked one-hot selector — exact row selection on the MXU
        outs = []
        for gi in range(g):
            outs.append(dot(e_exp, x2d[gi * n:(gi + 1) * n]))
        return jnp.concatenate(outs, axis=0).reshape(g, 2 * p, width)

    def contract(m3, width):
        # per-graph contraction dots back to nodes
        outs = []
        for gi in range(g):
            outs.append(dot(e_con, m3[gi]))
        del width
        return jnp.concatenate(outs, axis=0)

    # ---- SchNet interaction stack -------------------------------------
    for blk in range(nb):
        beta1 = scalars_ref[blk, 0]
        beta2 = scalars_ref[blk, 1]
        act_beta = scalars_ref[blk, 2]

        x1 = _leaky(dot(h, l1a_k_ref[blk]) + l1a_b_ref[blk])   # (g*n, F1)
        x2 = _leaky(dot(h, l1b_k_ref[blk]) + l1b_b_ref[blk])   # (g*n, F2)
        x_cat = jnp.concatenate([x1, x2], axis=-1)

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
        fw = f1 + t2.shape[-1]
        t_cat = jnp.concatenate([t1, t2], axis=-1)             # (g*p, FW)

        if SPLIT_AGG:
            # halves of the stacked selectors: e_exp = [EJ; EI],
            # e_con = [EI^T | EJ^T]
            ej, ei = e_exp[:p], e_exp[p:]
            eit, ejt = e_con[:, :p], e_con[:, p:]
            t3 = t_cat.reshape(g, p, fw)
            outs = []
            for gi in range(g):
                xg = x_cat[gi * n:(gi + 1) * n]
                tg = t3[gi]
                m_up = tg * dot(ej, xg)        # t * x_j  (P, FW)
                m_lo = tg * dot(ei, xg)        # t * x_i
                outs.append(dot(eit, m_up) + dot(ejt, m_lo))
            a = jnp.concatenate(outs, axis=0)                  # (g*n, FW)
        else:
            xij = expand(x_cat, fw)                            # (g, 2P, FW)
            t3 = t_cat.reshape(g, p, fw)
            tt = jnp.concatenate([t3, t3], axis=1)             # (g, 2P, FW)
            a = contract(tt * xij, fw)                         # (g*n, FW)

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

    if mode == "schnet":
        out_h_ref[:] = h.reshape(g, n, f)
        return

    # ---- GIN local branch ----------------------------------------------
    epl = epl_ref[:].reshape(g * p, c)
    e3 = epl.astype(jnp.float32).reshape(g, p, c)
    e2 = jnp.concatenate([e3, e3], axis=1)                     # (g, 2P, C)
    lm = lm_ref[:]                                             # (g, P) f32
    m2 = jnp.concatenate([lm, lm], axis=1)[..., None]          # (g, 2P, 1)
    hl = hl0_ref[:].reshape(g * n, f).astype(jnp.float32)
    for li in range(nl):
        hij = expand(hl, f)                                    # (g, 2P, H)
        # m in {0,1} commutes with relu: m*relu(x) == relu(m*x)
        msg = jax.nn.relu((hij + e2) * m2)
        agg = contract(msg, f)                                 # (g*n, H)
        out = hl + agg
        out = jax.nn.relu(dot(out, g0k_ref[li]) + g0b_ref[li])
        out = dot(out, g1k_ref[li]) + g1b_ref[li]
        if li < nl - 1:
            out = jax.nn.relu(out)
        hl = out + hl

    if mode == "gin":
        out_h_ref[:] = h.reshape(g, n, f)
        out_hl_ref[:] = hl.reshape(g, n, f)
        return

    # ---- pair-score MLP heads (fast_forward.pair_scores_packed) --------
    def scores(hx, e2d, w1h, w1e, b1, w2, b2, w3, b3):
        ys = []
        for gi in range(g):
            y = dot(e_exp, hx[gi * n:(gi + 1) * n])            # (2P, H)
            ys.append(y[p:] * y[:p])                           # h_i * h_j
        prod = jnp.concatenate(ys, axis=0)                     # (g*p, H)
        x = act_fn(dot(prod, w1h[:]) + dot(e2d, w1e[:]) + b1[:])
        y = act_fn(dot(x, w2[:]) + b2[:])
        # last layer as a lane reduce ((g*p, 1) would change the lane dim)
        y3 = y.reshape(g, p, y.shape[-1])
        return jnp.sum(y3 * w3[:][None].astype(jnp.float32),
                       axis=-1) + b3                           # (g, P)

    out_sg_ref[:] = scores(h, ep, sg_w1h_ref, sg_w1e_ref, sg_b1_ref,
                           sg_w2_ref, sg_b2_ref, sg_w3_ref,
                           scalars_ref[nb, 0])
    out_sl_ref[:] = scores(hl, epl, sl_w1h_ref, sl_w1e_ref, sl_b1_ref,
                           sl_w2_ref, sl_b2_ref, sl_w3_ref,
                           scalars_ref[nb, 1])


def packed_stack_forward(e_packed, we, h0, blocks, *, mode: str = "schnet",
                         e_packed_local=None, local_mask_p=None, hl0=None,
                         gin_layers=None, grad_global=None, grad_local=None,
                         group: int | None = None, selectors=None,
                         softplus_fn=jax.nn.softplus,
                         sigmoid_fn=jax.nn.sigmoid,
                         act_fn=jax.nn.relu,
                         vmem_limit_bytes: int = 96 * 1024 * 1024):
    """Run the packed per-step forward (post edge-encoder) as ONE kernel.

    e_packed: (B, P, C) edge features on the triu pair set (ops/pairs.py
    order). we: (2*NB, B, P) f32 per-pair scalar planes (distance weight x
    envelope x edge mask), ordered [blk0 conv1, blk0 conv2, blk1 conv1,
    ...] — zero on padded/invalid pairs, which keeps padded nodes'
    aggregates at exactly 0. h0: (B, N, H) initial SchNet node embedding.
    blocks: folded per-block dicts from fast_forward.fold_eval_params.

    mode='schnet' returns h_final (B, N, H) f32.
    mode='gin'    also needs e_packed_local/local_mask_p/hl0/gin_layers and
                  returns (h_final, hl_final).
    mode='full'   also needs grad_global/grad_local (the folded 6-tuple
                  score-MLP params) and returns the two PACKED score
                  planes (score_global, score_local), each (B, P) f32 —
                  mirror to dense + mask on the XLA side.

    selectors: optional (e_exp (2P, N), e_con (N, 2P)) stacked one-hot
    endpoint selectors ([EJ; EI] / [EI^T | EJ^T]) overriding the static
    full-triu pair set — this is how the TIGHT engine reuses the kernel:
    its shared molecule-sized pair list (tight_forward.PairPack, traced
    values so one compiled ladder serves every molecule) becomes the
    selector pair, P becomes the pair capacity, and pad slots carry
    all-zero selector rows (their we/mask planes are zero too, so padded
    aggregates stay exactly 0).
    """
    assert mode in MODES, mode
    b, p, c = e_packed.shape
    n = h0.shape[1]
    nb = len(blocks)
    assert we.shape == (2 * nb, b, p), (we.shape, nb, b, p)
    if selectors is None:
        assert p == n * (n - 1) // 2, (p, n)
        e_exp, e_con = _selectors(n)
    else:
        e_exp, e_con = selectors
        assert e_exp.shape == (2 * p, n), (e_exp.shape, p, n)
        assert e_con.shape == (n, 2 * p), (e_con.shape, p, n)
    g = _stack_group(b, GROUP_DEFAULT if group is None else group)
    nl = len(gin_layers) if gin_layers is not None else 0

    def stk(path):
        return jnp.stack([path(blk) for blk in blocks])

    def bias(path):
        # biases kept 2-D per block — ref[blk] then yields (1, F), which
        # broadcasts over rows (Mosaic 1-D slices are less reliable)
        return jnp.stack([path(blk).reshape(1, -1) for blk in blocks])

    def sc(v):
        return jnp.asarray(v, jnp.float32).reshape(())

    scalars = jnp.stack(
        [jnp.stack([sc(blk["convs"][0]["beta"]), sc(blk["convs"][1]["beta"]),
                    sc(blk["act_beta"])]) for blk in blocks]
        + [jnp.stack([sc(grad_global[5][0] if mode == "full" else 0.0),
                      sc(grad_local[5][0] if mode == "full" else 0.0),
                      sc(0.0)])]
    )  # (NB+1, 3): per-block betas + the two score-head output biases

    args = [e_packed, we, h0]
    if mode != "schnet":
        args += [e_packed_local,
                 local_mask_p.astype(jnp.float32),
                 hl0]
    args += [e_exp, e_con]
    args += [
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
    ]
    if mode != "schnet":
        args += [
            jnp.stack([l["l0"][0] for l in gin_layers]),
            jnp.stack([l["l0"][1].reshape(1, -1) for l in gin_layers]),
            jnp.stack([l["l1"][0] for l in gin_layers]),
            jnp.stack([l["l1"][1].reshape(1, -1) for l in gin_layers]),
        ]
    if mode == "full":
        def head(p6):
            w1, b1, w2, b2, w3, _ = p6
            return [w1[:c], w1[c:], b1.reshape(1, -1), w2,
                    b2.reshape(1, -1), w3.reshape(1, -1)]

        args += head(grad_global) + head(grad_local)
    args += [scalars]

    f = h0.shape[-1]
    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((g, p, c), lambda i: (i, 0, 0), memory_space=vm),
        pl.BlockSpec((2 * nb, g, p), lambda i: (0, i, 0), memory_space=vm),
        pl.BlockSpec((g, n, f), lambda i: (i, 0, 0), memory_space=vm),
    ]
    if mode != "schnet":
        in_specs += [
            pl.BlockSpec((g, p, c), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((g, p), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((g, n, f), lambda i: (i, 0, 0), memory_space=vm),
        ]
    in_specs += [_wspec(a) for a in args[len(in_specs):-1]] + [
        pl.BlockSpec(scalars.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    node_spec = pl.BlockSpec((g, n, f), lambda i: (i, 0, 0),
                             memory_space=vm)
    node_shape = jax.ShapeDtypeStruct((b, n, f), jnp.float32)
    plane_spec = pl.BlockSpec((g, p), lambda i: (i, 0), memory_space=vm)
    plane_shape = jax.ShapeDtypeStruct((b, p), jnp.float32)
    out_specs, out_shape = {
        "schnet": (node_spec, node_shape),
        "gin": ((node_spec, node_spec), (node_shape, node_shape)),
        "full": ((plane_spec, plane_spec), (plane_shape, plane_shape)),
    }[mode]
    kernel = functools.partial(_stack_kernel, nb=nb, nl=nl, g=g, p=p, n=n,
                               c=c, mode=mode, softplus_fn=softplus_fn,
                               sigmoid_fn=sigmoid_fn, act_fn=act_fn)
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=_INTERPRET,
    )(*args)
