"""Monolithic per-step Pallas kernel: the ENTIRE eval-mode forward in VMEM.

The sampler's per-step forward (reference hot loop:
src/agdiff/models/epsnet/dualenc.py:478-545) is HBM-bandwidth bound when run
as XLA ops: every (B, N, N, C) edge tensor round-trips to HBM between the
edge encoder, the 12 CFConv filter stacks, the GIN layers and the two
pair-score MLPs (~12% MFU measured in round 1). This kernel computes the
whole forward for a TILE of graphs in one pallas_call — edge features are
produced, consumed by all 22 consumers, and die without ever leaving VMEM.
Per step the kernel reads only distances/masks/types (0.5 MB) + weights
(~3 MB, constant across grid steps) and writes the two (B, N, N) score
planes.

Layout rules honored throughout (Mosaic rejects lane-dim-changing reshapes):
  * per-edge vectors live as (Bt*N, N, C) / (Bt*N*N, C) — reshapes only
    merge/split LEADING dims, the minor (lane) dim is always C;
  * per-edge scalars live as (Bt*N, N) and are lifted to vectors with
    expand_dims broadcasts ([:, :, None] * (C,)), never reshape;
  * neighbor aggregation sum_j W[b,i,j,:] * x[b,j,:] is an unrolled j-loop
    of 2D lane-aligned FMAs (the 3D middle-axis reduce is the pattern that
    fails Mosaic layout inference in bf16 on this toolchain);
  * tiny output dims (DistanceWeighting 32->1, attention H/2->1, score
    64->1) are lane reductions, not matmuls.

Statically-foldable work is hoisted OUT of the 5000-step scan entirely:
eval-mode BatchNorm folds into the linears (as in models/fast_forward.py),
and the bond-embedding halves of the edge-encoder concat layers
(edge.py:57-58: concat([*, bond]) @ W == * @ W_top + bond @ W_bot) fold into
two 128-row TYPE TABLES gathered in-kernel by a one-hot matmul — bond types
do not change during the ladder.

conv2's half-width filter path (num_filters//2, schnet.py:189-191) is
zero-padded to full width so the 12 convs share stacked weights: padded
filter columns are exactly 0 through ssp (softplus(0) - log2 = 0), padded
lin2 rows contribute 0 — bit-identical math, uniform shapes.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from agdiff_tpu.config import ModelConfig
from agdiff_tpu.data.graph_batch import GraphBatch
from agdiff_tpu.models.dualenc import ModelOutput
from agdiff_tpu.ops.geometry import pairwise_distance
from agdiff_tpu.ops.graph import extend_graph_order_dense, radius_union_mask

_INTERPRET = False  # flipped by tests on CPU

LN2 = 0.6931471805599453
TYPE_LANES = 128  # one-hot width for the bond-type tables (types are < 100)


def _pad_cols(a, width):
    a = np.asarray(a)
    if a.shape[-1] == width:
        return a
    pad = [(0, 0)] * (a.ndim - 1) + [(0, width - a.shape[-1])]
    return np.pad(a, pad)


def _pad_rows(a, height):
    a = np.asarray(a)
    if a.shape[0] == height:
        return a
    pad = [(0, height - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad)


def _prepare_weights(config: ModelConfig, variables: Dict[str, Any],
                     compute_dtype) -> Dict[str, jnp.ndarray]:
    """Fold BN + bond tables, stack per-conv/per-block weights, pad conv2's
    half-width filter path to full width. Returns name -> array (host)."""
    from agdiff_tpu.models.fast_forward import _fold_bn, _linear

    p = jax.tree_util.tree_map(np.asarray, variables)["params"]
    s = jax.tree_util.tree_map(np.asarray, variables)["batch_stats"]
    H = config.hidden_dim
    F = H  # num_filters == hidden_dim (dualenc.py:70-77)
    cd = compute_dtype

    if "edge_encoder_local" in p:
        raise NotImplementedError(
            "monolithic kernel supports tied edge encoders (the reference "
            "behavior, dualenc.py:214); use the module path for untied."
        )

    w: Dict[str, np.ndarray] = {}

    # ---- edge encoder: fold bond halves into type tables ----
    ee = p["edge_encoder_global"]
    emb = ee["bond_emb"]["embedding"]                      # (100, H)
    k_fe, b_fe = _linear(ee["feature_expansion"])          # (1,H), (H,)
    w0, b0 = _linear(ee["edge_feature_mlp_0"])             # (2H,H)
    w1, b1 = _linear(ee["edge_feature_mlp_1"])
    w2, b2 = _linear(ee["combination_mlp_0"])
    w3, b3 = _linear(ee["combination_mlp_1"])
    w["kfe"] = np.asarray(k_fe)[0:1, :]                    # (1, H)
    w["bfe"] = np.asarray(b_fe)[None, :]
    w["table0"] = _pad_rows(emb @ np.asarray(w0)[H:] + b0, TYPE_LANES)
    w["w0a"] = np.asarray(w0)[:H]
    w["w1"], w["b1"] = np.asarray(w1), np.asarray(b1)[None, :]
    w["table2"] = _pad_rows(emb @ np.asarray(w2)[H:] + b2, TYPE_LANES)
    w["w2a"] = np.asarray(w2)[:H]
    w["w3"], w["b3"] = np.asarray(w3), np.asarray(b3)[None, :]

    # ---- SchNet: 12 convs stacked (conv2 padded to F), 6 block tails ----
    sg, ss = p["encoder_global"], s["encoder_global"]
    convs = {k: [] for k in ("dw1k", "dw1b", "dw2k", "dw2b", "beta", "fa",
                             "ba", "fb", "bb", "l1k", "l1b", "l2k", "l2b")}
    blocks = {k: [] for k in ("act_beta", "link", "linb", "att0k", "att0b",
                              "att1k", "att1b", "se0", "se1")}
    for i in range(config.num_convs):
        bp, bs = sg[f"interactions_{i}"], ss[f"interactions_{i}"]
        for name in ("conv1", "conv2"):
            cp, cs = bp[name], bs[name]
            l1k, l1b = _fold_bn(*_linear(cp["lin1"]), cp["norm1"],
                                cs["norm1"])
            l2k, l2b = _fold_bn(*_linear(cp["lin2"]), cp["norm2"],
                                cs["norm2"])
            fa, ba = _linear(cp["filter_0"])
            fb, bb = _linear(cp["filter_1"])
            convs["dw1k"].append(
                np.asarray(cp["distance_weighting"]["layer1"]["kernel"])[0])
            convs["dw1b"].append(
                np.asarray(cp["distance_weighting"]["layer1"]["bias"]))
            convs["dw2k"].append(
                np.asarray(cp["distance_weighting"]["layer2"]["kernel"])[:, 0])
            convs["dw2b"].append(
                np.asarray(cp["distance_weighting"]["layer2"]["bias"]))
            convs["beta"].append(
                np.asarray(cp["filter_act"]["beta"]).reshape(1))
            convs["fa"].append(_pad_cols(fa, F))
            convs["ba"].append(_pad_cols(ba, F))
            convs["fb"].append(_pad_rows(_pad_cols(fb, F), F))
            convs["bb"].append(_pad_cols(bb, F))
            convs["l1k"].append(_pad_cols(np.asarray(l1k), F))
            convs["l1b"].append(_pad_cols(np.asarray(l1b), F))
            convs["l2k"].append(_pad_rows(np.asarray(l2k), F))
            convs["l2b"].append(np.asarray(l2b))
        blocks["act_beta"].append(
            np.asarray(bp["act"]["beta"]).reshape(1))
        blocks["link"].append(np.asarray(bp["lin"]["kernel"]))
        blocks["linb"].append(np.asarray(bp["lin"]["bias"]))
        blocks["att0k"].append(np.asarray(bp["attention_0"]["kernel"]))
        blocks["att0b"].append(np.asarray(bp["attention_0"]["bias"]))
        blocks["att1k"].append(np.asarray(bp["attention_1"]["kernel"])[:, 0])
        blocks["att1b"].append(np.asarray(bp["attention_1"]["bias"]))
        blocks["se0"].append(_pad_cols(
            np.asarray(sg[f"scaling_modules_{i}"]["fc_0"]["kernel"]), F))
        blocks["se1"].append(_pad_rows(
            np.asarray(sg[f"scaling_modules_{i}"]["fc_1"]["kernel"]), F))
    for k, v in convs.items():
        w[f"cv_{k}"] = np.stack(v)
    for k, v in blocks.items():
        w[f"bk_{k}"] = np.stack(v)
    w["schnet_emb"] = np.asarray(sg["embedding"]["embedding"])

    # ---- GIN (BN folded into second MLP layer) ----
    gl, gs = p["encoder_local"], s["encoder_local"]
    gin = {k: [] for k in ("l0k", "l0b", "l1k", "l1b")}
    for i in range(config.num_convs_local):
        mp = gl[f"convs_{i}"]["nn"]
        l1k, l1b = _fold_bn(*_linear(mp["layers_1"]),
                            gl[f"batch_norms_{i}"], gs[f"batch_norms_{i}"])
        gin["l0k"].append(np.asarray(mp["layers_0"]["kernel"]))
        gin["l0b"].append(np.asarray(mp["layers_0"]["bias"]))
        gin["l1k"].append(np.asarray(l1k))
        gin["l1b"].append(np.asarray(l1b))
    for k, v in gin.items():
        w[f"gn_{k}"] = np.stack(v)
    w["gin_emb"] = np.asarray(gl["node_emb"]["embedding"])

    # ---- grad MLPs: (2H -> H -> H/2 -> 1), split the concat layer ----
    sc = {k: [] for k in ("g1a", "g1e", "g1b", "g2k", "g2b", "g3k", "g3b")}
    for name in ("grad_global_dist_mlp", "grad_local_dist_mlp"):
        q = p[name]
        k1 = np.asarray(q["layers_0"]["kernel"])
        sc["g1a"].append(k1[:H])
        sc["g1e"].append(k1[H:])
        sc["g1b"].append(np.asarray(q["layers_0"]["bias"]))
        sc["g2k"].append(np.asarray(q["layers_1"]["kernel"]))
        sc["g2b"].append(np.asarray(q["layers_1"]["bias"]))
        sc["g3k"].append(np.asarray(q["layers_2"]["kernel"])[:, 0])
        sc["g3b"].append(np.asarray(q["layers_2"]["bias"]))
    for k, v in sc.items():
        w[f"sc_{k}"] = np.stack(v)

    # matmul operands in compute dtype, biases/scalars/tables f32
    out: Dict[str, jnp.ndarray] = {}
    matmul_keys = {"kfe", "w0a", "w1", "w2a", "w3", "table0", "table2",
                   "cv_fa", "cv_fb", "cv_l1k", "cv_l2k", "bk_link",
                   "bk_att0k", "bk_se0", "bk_se1", "gn_l0k", "gn_l1k",
                   "sc_g1a", "sc_g1e", "sc_g2k"}
    for k, v in w.items():
        dt = cd if k in matmul_keys else np.float32
        out[k] = jnp.asarray(np.asarray(v), dtype=dt)
    return out


# canonical weight order for the kernel's positional refs
_WEIGHT_ORDER = (
    "kfe", "bfe", "table0", "w0a", "w1", "b1", "table2", "w2a", "w3", "b3",
    "cv_dw1k", "cv_dw1b", "cv_dw2k", "cv_dw2b", "cv_beta",
    "cv_fa", "cv_ba", "cv_fb", "cv_bb", "cv_l1k", "cv_l1b", "cv_l2k",
    "cv_l2b",
    "bk_act_beta", "bk_link", "bk_linb", "bk_att0k", "bk_att0b", "bk_att1k",
    "bk_att1b", "bk_se0", "bk_se1",
    "gn_l0k", "gn_l0b", "gn_l1k", "gn_l1b",
    "sc_g1a", "sc_g1e", "sc_g1b", "sc_g2k", "sc_g2b", "sc_g3k", "sc_g3b",
)


def _ssp(x, beta):
    return jax.nn.softplus(beta * x) - LN2


def _mono_kernel(dist_ref, emask_ref, lmask_ref, types_ref, h0_ref, hl0_ref,
                 *refs, bt, n, h, f, num_convs, num_local, smooth, cutoff,
                 mlp_act, cd):
    W = dict(zip(_WEIGHT_ORDER, refs[: len(_WEIGHT_ORDER)]))
    out_g_ref, out_l_ref = refs[len(_WEIGHT_ORDER):]
    act = {"relu": jax.nn.relu, "gelu": jax.nn.gelu}[mlp_act]
    r2 = bt * n        # (graph, node-i) rows
    r3 = bt * n * n    # (graph, i, j) edge rows
    f32 = jnp.float32

    d = dist_ref[:].reshape(r2, n)                       # f32
    em = emask_ref[:].reshape(r2, n)                     # f32 0/1
    lm = lmask_ref[:].reshape(r2, n)
    types = types_ref[:].reshape(r2, n)

    # ---- bond-type one-hot (types < 100 < TYPE_LANES) ----
    lane = jax.lax.broadcasted_iota(jnp.int32, (r2, n, TYPE_LANES), 2)
    oh = (types[:, :, None] == lane).astype(cd).reshape(r3, TYPE_LANES)

    # ---- edge encoder (bond halves pre-folded into tables) ----
    d3 = d[:, :, None]                                   # (r2, n, 1)
    expanded = jax.nn.gelu(d3 * W["kfe"][0] + W["bfe"][0])
    expanded = expanded.reshape(r3, h).astype(cd)
    bond0 = jnp.dot(oh, W["table0"][:], preferred_element_type=f32)
    x = jax.nn.gelu(
        jnp.dot(expanded, W["w0a"][:], preferred_element_type=f32) + bond0)
    x = jnp.dot(x.astype(cd), W["w1"][:],
                preferred_element_type=f32) + W["b1"][:]
    bond2 = jnp.dot(oh, W["table2"][:], preferred_element_type=f32)
    y = jax.nn.gelu(
        jnp.dot(x.astype(cd), W["w2a"][:], preferred_element_type=f32)
        + bond2)
    e = jnp.dot(y.astype(cd), W["w3"][:],
                preferred_element_type=f32) + W["b3"][:]
    ecd = e.astype(cd)                                   # (r3, h) lives on
    e3 = ecd.reshape(r2, n, h)

    # ---- cutoff envelope (schnet.py:140-149) ----
    if smooth:
        env = 0.5 * (jnp.cos(d * (np.pi / cutoff)) + 1.0)
        env = env * (d <= cutoff)
    else:
        env = jnp.exp(-((d - cutoff) ** 2) / (2.0 * cutoff * cutoff))
    env = env * (d <= cutoff) * (d >= 0.0) * em          # (r2, n)

    def aggregate(w3cd, xn):
        """acc[b,i,:] = sum_j w[b,i,j,:] * xn[b,j,:] — unrolled 2D FMAs."""
        xn3 = xn.reshape(bt, n, f)
        acc = jnp.zeros((r2, f), f32)
        for j in range(n):
            wj = w3cd[:, j, :].astype(f32)
            xj = jnp.broadcast_to(
                xn3[:, j:j + 1, :], (bt, n, f)).reshape(r2, f).astype(f32)
            acc = acc + wj * xj
        return acc

    # ---- SchNet global branch ----
    hg = h0_ref[:].reshape(r2, h).astype(f32)
    for b_i in range(num_convs):
        ps = []
        for c in (2 * b_i, 2 * b_i + 1):
            # DistanceWeightingNetwork (1 -> 32 -> 1, lane reduce)
            xdw = jax.nn.relu(d3 * W["cv_dw1k"][c:c + 1, :]
                              + W["cv_dw1b"][c:c + 1, :])
            lw = jax.nn.sigmoid(
                jnp.sum(xdw * W["cv_dw2k"][c:c + 1, :], axis=-1)
                + W["cv_dw2b"][c, 0])
            wedge = lw * env                              # (r2, n)
            # filter MLP over edges
            wflt = _ssp(
                jnp.dot(ecd, W["cv_fa"][c], preferred_element_type=f32)
                + W["cv_ba"][c:c + 1, :], W["cv_beta"][c, 0])
            wflt = jnp.dot(wflt.astype(cd), W["cv_fb"][c],
                           preferred_element_type=f32) + W["cv_bb"][c:c + 1, :]
            w3cd = (wflt.reshape(r2, n, f) * wedge[:, :, None]).astype(cd)
            # node path + aggregation
            xn = jax.nn.leaky_relu(
                jnp.dot(hg.astype(cd), W["cv_l1k"][c],
                        preferred_element_type=f32)
                + W["cv_l1b"][c:c + 1, :], negative_slope=0.2).astype(cd)
            acc = aggregate(w3cd, xn)
            p = jnp.dot(acc.astype(cd), W["cv_l2k"][c],
                        preferred_element_type=f32) + W["cv_l2b"][c:c + 1, :]
            ps.append(p)
        comb = _ssp(jnp.concatenate(ps, axis=-1), W["bk_act_beta"][b_i, 0])
        comb = jnp.dot(comb.astype(cd), W["bk_link"][b_i],
                       preferred_element_type=f32) + W["bk_linb"][b_i:b_i + 1]
        gate = jax.nn.relu(
            jnp.dot(comb.astype(cd), W["bk_att0k"][b_i],
                    preferred_element_type=f32)
            + W["bk_att0b"][b_i:b_i + 1])
        gate = jax.nn.sigmoid(
            jnp.sum(gate * W["bk_att1k"][b_i:b_i + 1], axis=-1, keepdims=True)
            + W["bk_att1b"][b_i, 0])
        out = comb * gate
        se = jax.nn.relu(jnp.dot(out.astype(cd), W["bk_se0"][b_i],
                                 preferred_element_type=f32))
        se = jax.nn.sigmoid(jnp.dot(se.astype(cd), W["bk_se1"][b_i],
                                    preferred_element_type=f32))
        hg = hg + out * se

    def pair_scores(node, s_i, mask2):
        hcd = node.astype(cd)
        hi = jnp.broadcast_to(hcd[:, None, :], (r2, n, h))
        hj = jnp.broadcast_to(
            hcd.reshape(bt, n, h)[:, None, :, :], (bt, n, n, h)
        ).reshape(r2, n, h)
        prod = (hi * hj).reshape(r3, h)
        xs = act(jnp.dot(prod, W["sc_g1a"][s_i], preferred_element_type=f32)
                 + jnp.dot(ecd, W["sc_g1e"][s_i], preferred_element_type=f32)
                 + W["sc_g1b"][s_i:s_i + 1])
        ys = act(jnp.dot(xs.astype(cd), W["sc_g2k"][s_i],
                         preferred_element_type=f32)
                 + W["sc_g2b"][s_i:s_i + 1])
        y3 = ys.reshape(r2, n, ys.shape[-1])
        s = jnp.sum(y3 * W["sc_g3k"][s_i][None, None, :], axis=-1) \
            + W["sc_g3b"][s_i, 0]
        return (s * mask2).reshape(bt, n, n)

    out_g_ref[:] = pair_scores(hg, 0, em)

    # ---- GIN local branch ----
    hl = hl0_ref[:].reshape(r2, h).astype(f32)
    for li in range(num_local):
        hl3 = hl.reshape(bt, n, h)
        acc = jnp.zeros((r2, h), f32)
        for j in range(n):
            ej = e3[:, j, :].astype(f32)
            xj = jnp.broadcast_to(
                hl3[:, j:j + 1, :], (bt, n, h)).reshape(r2, h)
            acc = acc + lm[:, j:j + 1] * jax.nn.relu(xj + ej)
        o = hl + acc
        o = jax.nn.relu(jnp.dot(o.astype(cd), W["gn_l0k"][li],
                                preferred_element_type=f32)
                        + W["gn_l0b"][li:li + 1])
        o = jnp.dot(o.astype(cd), W["gn_l1k"][li],
                    preferred_element_type=f32) + W["gn_l1b"][li:li + 1]
        if li < num_local - 1:
            o = jax.nn.relu(o)
        hl = o + hl

    out_l_ref[:] = pair_scores(hl, 1, lm)


def build_monolithic_forward(
    config: ModelConfig, variables: Dict[str, Any],
    compute_dtype=jnp.bfloat16, tile: int = 8, interpret=None,
):
    """Returns forward(batch, extend_order=..., extend_radius=...) ->
    ModelOutput, value-equivalent to models/fast_forward.py (itself
    equivalence-tested against the flax module path). `tile` graphs are
    processed per grid step; B must be divisible by the effective tile."""
    cfg = config
    if cfg.edge_encoder != "mlp":
        raise NotImplementedError("monolithic kernel: mlp edge encoder only")
    if cfg.edge_attention_mode == "sigmoid":
        raise NotImplementedError(
            "monolithic kernel elides the reference's identity softmax; "
            "'sigmoid' needs the module path")
    if interpret is None:
        interpret = _INTERPRET
    w = _prepare_weights(cfg, variables, compute_dtype)
    schnet_emb = w.pop("schnet_emb")
    gin_emb = w.pop("gin_emb")
    weight_args = [w[k] for k in _WEIGHT_ORDER]
    H = cfg.hidden_dim
    max_norm = cfg.embedding_max_norm

    def forward(batch: GraphBatch, *, extend_order: bool = False,
                extend_radius: bool = True) -> ModelOutput:
        node_mask = batch.node_mask
        bond_adj = batch.bond_adj
        if extend_order:
            bond_adj = extend_graph_order_dense(bond_adj, order=cfg.edge_order)
        dist = pairwise_distance(batch.pos)
        if extend_radius:
            edge_mask, edge_type, local_mask = radius_union_mask(
                dist, bond_adj, node_mask, cfg.cutoff
            )
        else:
            nn_ = dist.shape[-1]
            pair = (node_mask[:, :, None] & node_mask[:, None, :]
                    & ~jnp.eye(nn_, dtype=bool)[None])
            local_mask = (bond_adj > 0) & pair
            edge_mask = local_mask
            edge_type = jnp.where(edge_mask, bond_adj, 0).astype(jnp.int32)

        b, n = batch.atom_type.shape
        bt = tile
        while b % bt:
            bt -= 1

        # node embeddings (position-independent; tiny XLA gathers)
        h0 = schnet_emb[batch.atom_type]
        if max_norm is not None:
            norm = jnp.linalg.norm(h0, axis=-1, keepdims=True)
            h0 = h0 * jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
        hl0 = gin_emb[batch.atom_type]

        kernel = functools.partial(
            _mono_kernel, bt=bt, n=n, h=H, f=H,
            num_convs=cfg.num_convs, num_local=cfg.num_convs_local,
            smooth=cfg.smooth_conv, cutoff=cfg.cutoff, mlp_act=cfg.mlp_act,
            cd=compute_dtype,
        )
        vm = pltpu.VMEM
        data_specs = [
            pl.BlockSpec((bt, n, n), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((bt, n, n), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((bt, n, n), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((bt, n, n), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((bt, n, H), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((bt, n, H), lambda i: (i, 0, 0), memory_space=vm),
        ]
        weight_specs = [
            pl.BlockSpec(a.shape, functools.partial(
                lambda nd, i: (0,) * nd, a.ndim), memory_space=vm)
            for a in weight_args
        ]
        out_specs = (
            pl.BlockSpec((bt, n, n), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((bt, n, n), lambda i: (i, 0, 0), memory_space=vm),
        )
        eg, el_ = pl.pallas_call(
            kernel,
            grid=(b // bt,),
            in_specs=data_specs + weight_specs,
            out_specs=out_specs,
            out_shape=(
                jax.ShapeDtypeStruct((b, n, n), jnp.float32),
                jax.ShapeDtypeStruct((b, n, n), jnp.float32),
            ),
            # the whole-forward working set at tile=8 is ~64 MB; v5e has
            # 128 MB VMEM — lift XLA's conservative 16 MB scoped default
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            dist,
            edge_mask.astype(jnp.float32),
            local_mask.astype(jnp.float32),
            edge_type.astype(jnp.int32),
            h0.astype(compute_dtype),
            hl0.astype(compute_dtype),
            *weight_args,
        )
        return ModelOutput(
            edge_inv_global=eg,
            edge_inv_local=el_,
            edge_mask=edge_mask,
            edge_type=edge_type,
            edge_length=dist,
            local_mask=local_mask,
        )

    return forward
