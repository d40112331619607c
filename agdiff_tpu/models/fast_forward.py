"""Optimized eval-mode forward (the serving/inference path).

A hand-scheduled implementation of DualEncoderEpsNetwork's eval-mode forward
that the sampler uses for generation. Differences from the flax module path
(models/dualenc.py), all value-preserving:

  * BatchNorm (eval mode = affine with running stats) is folded into the
    preceding Linear layers;
  * the identity softmax-attention of MLPEdgeEncoder (a reference quirk —
    softmax over a singleton axis == 1.0, edge.py:73-78) is skipped exactly;
  * the three HBM-heavy edge-block consumers run as fused Pallas kernels
    (ops/pallas/fused.py): pair-score MLPs, CFConv filter+aggregate, GINE
    message+aggregate — nothing (B, N, N, F)-shaped round-trips to HBM
    except the edge features themselves.

Equivalence with model.apply(train=False) is enforced by
tests/test_fast_forward.py. Training always uses the flax path (autodiff).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from agdiff_tpu.config import ModelConfig
from agdiff_tpu.data.graph_batch import GraphBatch
from agdiff_tpu.models.dualenc import ModelOutput
from agdiff_tpu.ops.geometry import pairwise_distance
from agdiff_tpu.ops.graph import extend_graph_order_dense, radius_union_mask
from agdiff_tpu.ops.pallas.fused import (
    gine_aggregate,
    interaction_block_aggregate,
    pair_score_mlp,
)

LN2 = 0.6931471805599453


def _fold_bn(kernel, bias, bn_params, bn_stats, eps=1e-5):
    """Fold an eval-mode BatchNorm into the preceding Linear:
    BN(xW + b) = x (W * g) + ((b - mean) * g + beta), g = scale/sqrt(var+eps).
    """
    inv = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    return kernel * inv[None, :], (bias - bn_stats["mean"]) * inv + bn_params["bias"]


def _linear(p):
    return p["kernel"], p["bias"]


def _embed_lookup(table, ids, max_norm=None):
    e = table[ids]
    if max_norm is not None:
        norm = jnp.linalg.norm(e, axis=-1, keepdims=True)
        e = e * jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return e


def _ssp(x, beta, sp=jax.nn.softplus):
    return sp(beta * x) - LN2


def fold_eval_params(config: ModelConfig, variables: Dict[str, Any]):
    """Fold eval-mode BatchNorm into the preceding Linears and flatten the
    module tree into plain dicts of arrays. Shared by the fast engines
    (this module and models/tight_forward.py)."""
    # params may be host numpy (e.g. a checkpoint restored without a target);
    # promote to jnp so embedding lookups accept traced indices
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    p = variables["params"]
    s = variables["batch_stats"]
    cfg = config

    blocks = []
    sg, ss = p["encoder_global"], s["encoder_global"]
    for i in range(cfg.num_convs):
        bp, bs = sg[f"interactions_{i}"], ss[f"interactions_{i}"]
        convs = []
        for name in ("conv1", "conv2"):
            cp, cs = bp[name], bs[name]
            lin1_k, lin1_b = _fold_bn(*_linear(cp["lin1"]), cp["norm1"],
                                      cs["norm1"])
            lin2_k, lin2_b = _fold_bn(*_linear(cp["lin2"]), cp["norm2"],
                                      cs["norm2"])
            convs.append(dict(
                dw1=_linear(cp["distance_weighting"]["layer1"]),
                dw2=_linear(cp["distance_weighting"]["layer2"]),
                fa=_linear(cp["filter_0"]),
                beta=cp["filter_act"]["beta"],
                fb=_linear(cp["filter_1"]),
                lin1=(lin1_k, lin1_b),
                lin2=(lin2_k, lin2_b),
            ))
        blocks.append(dict(
            convs=convs,
            act_beta=bp["act"]["beta"],
            lin=_linear(bp["lin"]),
            att0=_linear(bp["attention_0"]),
            att1=_linear(bp["attention_1"]),
            se0=sg[f"scaling_modules_{i}"]["fc_0"]["kernel"],
            se1=sg[f"scaling_modules_{i}"]["fc_1"]["kernel"],
        ))

    gl, gs = p["encoder_local"], s["encoder_local"]
    gin_layers = []
    for i in range(cfg.num_convs_local):
        mp = gl[f"convs_{i}"]["nn"]
        l0_k, l0_b = _linear(mp["layers_0"])
        # BN follows the MLP's second layer output
        l1_k, l1_b = _fold_bn(*_linear(mp["layers_1"]),
                              gl[f"batch_norms_{i}"], gs[f"batch_norms_{i}"])
        gin_layers.append(dict(l0=(l0_k, l0_b), l1=(l1_k, l1_b)))

    def mlp3(prefix):
        q = p[prefix]
        return (q["layers_0"]["kernel"], q["layers_0"]["bias"],
                q["layers_1"]["kernel"], q["layers_1"]["bias"],
                q["layers_2"]["kernel"], q["layers_2"]["bias"])

    return dict(
        ee=p["edge_encoder_global"],
        ee_local=p.get("edge_encoder_local"),  # present only if untied
        blocks=blocks,
        schnet_emb=sg["embedding"]["embedding"],
        gin_layers=gin_layers,
        gin_emb=gl["node_emb"]["embedding"],
        grad_global=mlp3("grad_global_dist_mlp"),
        grad_local=mlp3("grad_local_dist_mlp"),
    )


def edge_encode(enc_params, edge_length, edge_type, gelu=jax.nn.gelu):
    """MLPEdgeEncoder, minus the identity softmax attention.

    When the folded MLP params are narrow (build_fast_forward
    edge_dtype), the chain runs and STORES narrow from the first matmul
    on; the feature expansion stays f32 elementwise (one fusion, no
    materialized f32 buffer) so the distance input is never quantized.
    """
    k, b = _linear(enc_params["feature_expansion"])
    expanded = gelu(edge_length * k[0] + b)
    bond = enc_params["bond_emb"]["embedding"][edge_type]
    k, b = _linear(enc_params["edge_feature_mlp_0"])
    expanded = expanded.astype(k.dtype)
    bond = bond.astype(k.dtype)
    x = jnp.concatenate([expanded, bond], axis=-1)
    x = gelu(x @ k + b)
    k, b = _linear(enc_params["edge_feature_mlp_1"])
    x = x @ k + b
    y = jnp.concatenate([x, bond], axis=-1)
    k, b = _linear(enc_params["combination_mlp_0"])
    y = gelu(y @ k + b)
    k, b = _linear(enc_params["combination_mlp_1"])
    return y @ k + b


def distance_weight(conv, el, sigmoid=jax.nn.sigmoid):
    k1, b1 = conv["dw1"]
    k2, b2 = conv["dw2"]
    x = jax.nn.relu(el * k1[0] + b1)
    return sigmoid(x @ k2 + b2)[..., 0]


def stacked_distance_weights(blocks, el, env, sigmoid=jax.nn.sigmoid):
    """All 2*NB distance-weight x envelope planes in ONE fused chain,
    emitted directly as the stacked (2*NB, B, P) tensor the pks kernels
    consume.

    `jnp.stack([dweight(conv, el) * env for ...])` lowers to 2*NB-1
    dynamic-update-slice fusions that each rewrite the WHOLE stacked
    buffer (~33 MB/step of the pksf engine's 410 MB XLA residual,
    tools/hlo_traffic.py round 5). Stacking the tiny DistanceWeighting
    params instead and reducing with one einsum writes the tensor once.
    Same math per plane (relu(el*k1+b1) @ k2 -> sigmoid), same f32
    reduction over the hidden axis."""
    convs = [conv for blk in blocks for conv in blk["convs"]]
    k1 = jnp.stack([c["dw1"][0][0] for c in convs])       # (C, W)
    b1 = jnp.stack([c["dw1"][1] for c in convs])          # (C, W)
    k2 = jnp.stack([c["dw2"][0][:, 0] for c in convs])    # (C, W)
    b2 = jnp.stack([c["dw2"][1][0] for c in convs])       # (C,)
    x = jax.nn.relu(el[..., None] * k1 + b1)              # (B, P, C, W)
    y = sigmoid(jnp.einsum("bpcw,cw->cbp", x, k2)
                + b2[:, None, None])                      # (C, B, P)
    return y * env[None]


def envelope(d, cfg: ModelConfig):
    """CFConv cutoff envelope (schnet.py:140-149)."""
    if cfg.smooth_conv:
        env = 0.5 * (jnp.cos(d * jnp.pi / cfg.cutoff) + 1.0)
        env = env * (d <= cfg.cutoff)
    else:
        env = jnp.exp(-((d - cfg.cutoff) ** 2) / (2 * cfg.cutoff**2))
    return env * (d <= cfg.cutoff) * (d >= 0.0)


def node_input(conv, h):
    k, b = conv["lin1"]
    return jax.nn.leaky_relu(h @ k + b, negative_slope=0.2)


def build_fast_forward(
    config: ModelConfig, variables: Dict[str, Any], use_pallas: bool = True,
    compute_dtype=jnp.float32, pack_pairs: bool = True,
    approx: bool = False, filter_dtype=None, stack_filters: bool = False,
    store_dtype=None, packed_kernel: bool = False, score_dots: bool = True,
    packed_stack: bool = False, edge_dtype=None,
) -> Callable[[GraphBatch], ModelOutput]:
    """Returns forward(batch) -> ModelOutput, equivalent to
    model.apply(variables, batch, train=False). All parameter folding happens
    once here (outside jit), so the returned closure traces clean.
    compute_dtype=bfloat16 runs the edge-feature matmuls in bf16 (f32
    accumulation) — ~1e-2 relative error on scores, 2x MXU rate.

    pack_pairs exploits the symmetry of every per-pair quantity (distances,
    edge features, scores are all symmetric in (i, j)): the edge encoder and
    the pair-score MLPs run over the N(N-1)/2 unordered pairs instead of all
    N^2 ordered pairs (2.07x fewer rows), then results gather back to the
    dense layout the aggregations consume. Values are identical.

    approx=True swaps the hot transcendentals (softplus/sigmoid/gelu) for
    the polynomial/rational approximations in ops/approx.py — the per-step
    forward is VPU-transcendental-bound (CLAUDE.md cost model), and every
    approximation is below bf16 quantization noise. NOT value-identical to
    the module path; acceptance is protocol quality (tools/ab_engines.py
    fast-approx, README engine matrix).

    filter_dtype=jnp.bfloat16 runs the CFConv filter-MLP matmuls — the
    model's largest, historically kept f32 even in the bf16 engine — at
    bf16 MXU rate with f32 accumulation (preferred_element_type); the
    shifted-softplus still evaluates on the f32 accumulator. Quality-gated
    like approx (fast-bf16f in tools/ab_engines.py).

    stack_filters=True (requires pack_pairs, XLA path) restructures the
    per-step edge work around the observation that NONE of it depends on
    the evolving node features h: the 12 filter MLPs (6 blocks x 2 convs)
    all consume the same per-step edge_attr and the 12 distance-weight
    MLPs the same edge lengths. All 12 filters run as ONE wide first-layer
    matmul (128 -> 6*(128+64)=1152 lanes) + two grouped second-layer
    einsums; the distance weights, cutoff envelope and edge mask multiply
    the filters in PACKED space (half the element volume), and each block
    mirrors packed->dense ONCE at the concatenated width F=192 (conv1 128
    + conv2 64 share one gather + one aggregation einsum) instead of twice
    — the diagonal lands on an appended always-zero pair slot. Values are
    identical to the unstacked path (same contractions, same multiply
    order; tests/test_fast_forward.py).

    store_dtype (round 4) narrows the STORAGE dtype of the step's largest
    intermediate tensors — the filter-MLP outputs, their (B, N, N, F)
    dense mirrors, and the GIN message mirror — which the roofline
    (tools/roofline.py, README) identified as the binding resource: the
    step is HBM-traffic-bound and these buffers are f32 today (every
    filter matmul accumulates via preferred_element_type=f32 and the f32
    result is what materializes between fusions). With store_dtype set
    (jnp.bfloat16 or jnp.float8_e4m3fn) those buffers materialize narrow
    and the aggregation contractions run compute_dtype inputs with f32
    accumulation; the score-head MLPs also run at compute_dtype instead
    of silently promoting to f32. NOT value-identical — quality-gated
    like approx (engines fast-slim / fast-slim8 in tools/ab_engines.py).

    score_dots (default True, round 4): the pair-score MLPs read their
    endpoint node rows via exact one-hot MXU dots instead of gathers
    (XLA feeds the gathers through P-major layout copies,
    tools/hlo_traffic.py) and the first score matmul is split across the
    [prod | e] concat so the (B, P, 2C) concat never materializes.
    Module-equal at f32 (accumulation regrouping only); measured 1.029x
    at the QM9 point (round-4 A/B fast-slim vs fast-slim2).

    packed_kernel=True (round 4, requires pack_pairs, XLA elsewhere)
    replaces each interaction block's mirror+aggregate with the fused
    Pallas kernel ops/pallas/block_packed.py: the filter MLPs run on the
    packed pairs IN VMEM and aggregation goes straight to nodes via the
    static one-hot endpoint selectors — no (B, N, N, F) filter mirror
    (the step's dominant HBM traffic per tools/hlo_traffic.py) ever
    materializes. Distance weights/envelope/mask are computed packed in
    XLA and passed as (B, P) scalar planes. Value-equivalent to the
    packed XLA path up to f32-accumulation ordering; composes with
    store_dtype (which still narrows the GIN mirror + score heads).

    packed_stack=True (round 4) goes one step further than packed_kernel:
    the ENTIRE interaction stack — all num_convs blocks including the
    node-side MLPs, attention gate, SE gate and residuals — runs as ONE
    Pallas kernel (ops/pallas/stack_packed.py). h is carried across
    blocks in VMEM and e_packed is read from HBM once instead of once
    per block; the per-block kernel's ~45 us/block of boundary I/O and
    five of its six dispatch boundaries disappear. Same quality class
    as packed_kernel (f32-accumulation-order equivalent; bf16 compute
    runs the node matmuls at bf16 MXU rate like the filter matmuls)."""
    if config.edge_encoder != "mlp":
        raise NotImplementedError(
            "fast_forward supports the 'mlp' edge encoder (both reference "
            "configs); use the flax module path for 'gaussian'."
        )
    if config.edge_attention_mode == "sigmoid":
        raise NotImplementedError(
            "fast_forward elides the reference's identity softmax edge "
            "attention; the non-reference 'sigmoid' gate needs the module "
            "path."
        )
    if approx and use_pallas:
        raise ValueError("approx engines use the XLA path (use_pallas=False)")
    if stack_filters and (use_pallas or not pack_pairs):
        raise ValueError("stack_filters requires pack_pairs=True and the "
                         "XLA path (use_pallas=False)")
    if store_dtype is not None and (use_pallas or stack_filters):
        raise ValueError("store_dtype narrows the XLA-path buffers; it is "
                         "not supported with use_pallas or stack_filters")
    if packed_kernel and (use_pallas or stack_filters or not pack_pairs):
        raise ValueError("packed_kernel requires pack_pairs=True and is "
                         "exclusive with use_pallas/stack_filters")
    if packed_stack and (use_pallas or stack_filters or packed_kernel
                         or not pack_pairs):
        raise ValueError("packed_stack requires pack_pairs=True and is "
                         "exclusive with use_pallas/stack_filters/"
                         "packed_kernel")
    if packed_stack is True:
        packed_stack = "schnet"
    if packed_stack:
        from agdiff_tpu.ops.pallas.stack_packed import MODES

        if packed_stack not in MODES:
            raise ValueError(f"packed_stack mode {packed_stack!r} not in "
                             f"{MODES}")
    cfg = config
    if approx:
        from agdiff_tpu.ops import approx as _ax

        sp_fn, sig_fn, gelu_fn = _ax.softplus, _ax.sigmoid, _ax.gelu
    else:
        sp_fn, sig_fn, gelu_fn = (jax.nn.softplus, jax.nn.sigmoid,
                                  jax.nn.gelu)

    def ssp(x, beta):
        return _ssp(x, beta, sp=sp_fn)

    def dweight(conv, el):
        return distance_weight(conv, el, sigmoid=sig_fn)

    def encode(enc_params, el, tp):
        return edge_encode(enc_params, el, tp, gelu=gelu_fn)

    act = {"relu": jax.nn.relu, "gelu": gelu_fn}[cfg.mlp_act]

    folded = fold_eval_params(config, variables)
    ee, ee_local = folded["ee"], folded["ee_local"]
    if edge_dtype is not None:
        # Narrow the whole edge-encoder chain (the last f32 span in the
        # slim/pksf residual: ~160 MB/step of gelu-MLP intermediates,
        # tools/hlo_traffic). Casting the folded params makes every matmul
        # edge_dtype x edge_dtype, so the intermediate buffers store
        # narrow; the trailing astype(compute_dtype) becomes a no-op.
        _cast = lambda t: {
            k: (v if k == "feature_expansion"  # stays f32 (fused elementwise)
                else jax.tree.map(
                    lambda a: a.astype(edge_dtype)
                    if a.dtype == jnp.float32 else a, v))
            for k, v in t.items()}
        ee = _cast(ee)
        ee_local = _cast(ee_local) if ee_local is not None else None
    blocks, schnet_emb = folded["blocks"], folded["schnet_emb"]
    sdt = store_dtype
    if sdt is not None and filter_dtype is None:
        # narrow storage implies narrow filter-matmul inputs too, else the
        # e_packed.astype(f32) copies reintroduce the f32 traffic
        filter_dtype = compute_dtype
    fdt = filter_dtype or jnp.float32
    if filter_dtype is not None:
        for _blk in blocks:
            for _conv in _blk["convs"]:
                _conv["fa"] = (_conv["fa"][0].astype(fdt), _conv["fa"][1])
                _conv["fb"] = (_conv["fb"][0].astype(fdt), _conv["fb"][1])
    gin_layers, gin_emb = folded["gin_layers"], folded["gin_emb"]
    grad_global, grad_local = folded["grad_global"], folded["grad_local"]
    if sdt is not None:
        # score heads at compute_dtype: today a bf16 `pair` silently
        # promotes to f32 against the f32 weights, materializing f32
        # copies of the (B, P, 2F) inputs; the final matmul below keeps
        # an f32 accumulator either way
        grad_global = tuple(p.astype(compute_dtype) for p in grad_global)
        grad_local = tuple(p.astype(compute_dtype) for p in grad_local)

    stacked = None
    if stack_filters:
        convs_all = [c for blk in blocks for c in blk["convs"]]
        widths = [c["fa"][0].shape[1] for c in convs_all]  # 128,64,128,64,...
        offs = np.concatenate([[0], np.cumsum(widths)])
        stacked = dict(
            # one wide first layer over the shared edge_attr input
            fa_k=jnp.concatenate([c["fa"][0].astype(fdt)
                                  for c in convs_all], axis=1),
            fa_b=jnp.concatenate([c["fa"][1] for c in convs_all]),
            beta=jnp.concatenate([
                jnp.broadcast_to(c["beta"], (w,))
                for c, w in zip(convs_all, widths)]),
            offs=offs,
            # grouped second layers: 6 conv1 filters (H->128) and 6 conv2
            # filters (H/2->64) as two batched einsums
            fb1_k=jnp.stack([b["convs"][0]["fb"][0].astype(fdt)
                             for b in blocks]),
            fb1_b=jnp.stack([b["convs"][0]["fb"][1] for b in blocks]),
            fb2_k=jnp.stack([b["convs"][1]["fb"][0].astype(fdt)
                             for b in blocks]),
            fb2_b=jnp.stack([b["convs"][1]["fb"][1] for b in blocks]),
            # 12 distance-weight MLPs: one wide relu layer + grouped head
            dw1_k=jnp.concatenate([c["dw1"][0] for c in convs_all], axis=1),
            dw1_b=jnp.concatenate([c["dw1"][1] for c in convs_all]),
            dw2_k=jnp.stack([c["dw2"][0][:, 0] for c in convs_all]),
            dw2_b=jnp.stack([c["dw2"][1][0] for c in convs_all]),
            dw_hidden=convs_all[0]["dw1"][0].shape[1],
        )

    def stacked_filters_packed(e_packed, el_packed, edge_mask_packed):
        """All 12 CFConv filters (x distance weight x envelope x edge mask)
        on the packed pair set: returns per-block (B, P, 192) tensors,
        conv1 filter in [..., :H], conv2 in [..., H:]."""
        st = stacked
        B, P = e_packed.shape[:2]
        n_blocks = len(blocks)
        # distance weights: (B, P, 12)
        u = jax.nn.relu(el_packed * st["dw1_k"][0] + st["dw1_b"])
        u = u.reshape(B, P, 2 * n_blocks, st["dw_hidden"])
        lw = sig_fn(jnp.einsum("bpkh,kh->bpk", u, st["dw2_k"])
                    + st["dw2_b"])
        env_p = envelope(el_packed[..., 0], cfg) * edge_mask_packed
        we = lw * env_p[..., None]                       # (B, P, 12)
        # filters: one wide matmul, then grouped second layers
        v = ssp(jnp.matmul(e_packed.astype(fdt), st["fa_k"],
                           preferred_element_type=jnp.float32)
                + st["fa_b"], st["beta"])                # (B, P, 1152)
        offs = st["offs"]
        v1 = jnp.stack([v[..., offs[2 * i]:offs[2 * i + 1]]
                        for i in range(n_blocks)], axis=2)  # (B,P,6,H)
        v2 = jnp.stack([v[..., offs[2 * i + 1]:offs[2 * i + 2]]
                        for i in range(n_blocks)], axis=2)  # (B,P,6,H/2)
        w1 = jnp.einsum("bpkh,khf->bpkf", v1.astype(fdt), st["fb1_k"],
                        preferred_element_type=jnp.float32) + st["fb1_b"]
        w2 = jnp.einsum("bpkh,khf->bpkf", v2.astype(fdt), st["fb2_k"],
                        preferred_element_type=jnp.float32) + st["fb2_b"]
        w1 = w1 * we[:, :, 0::2, None]
        w2 = w2 * we[:, :, 1::2, None]
        return [jnp.concatenate([w1[:, :, i], w2[:, :, i]], axis=-1)
                for i in range(n_blocks)]

    def cf_pathway_xla(conv, h, edge_attr, el, env_mask):
        lw = dweight(conv, el)
        w_edge = lw * env_mask  # (B, N, N)
        x = node_input(conv, h)
        w = ssp(jnp.matmul(edge_attr.astype(fdt), conv["fa"][0],
                           preferred_element_type=jnp.float32)
                + conv["fa"][1], conv["beta"])
        w = (jnp.matmul(w.astype(fdt), conv["fb"][0],
                        preferred_element_type=jnp.float32)
             + conv["fb"][1])
        if sdt is not None:
            w = (w.astype(sdt).astype(compute_dtype)
                 * w_edge[..., None].astype(compute_dtype))
            return jnp.einsum("bijf,bjf->bif", w, x.astype(compute_dtype),
                              preferred_element_type=jnp.float32)
        w = w * w_edge[..., None]
        return jnp.einsum("bijf,bjf->bif", w, x)

    def cf_pathway_packed(conv, h, e_packed, pair_id, el, env_mask):
        # filter MLP over unordered pairs (the filter is symmetric in (i,j)
        # because edge_attr is), mirrored to dense only for the aggregation
        lw = dweight(conv, el)
        w_edge = lw * env_mask
        x = node_input(conv, h)
        wp = ssp(jnp.matmul(e_packed.astype(fdt), conv["fa"][0],
                            preferred_element_type=jnp.float32)
                 + conv["fa"][1], conv["beta"])
        wp = jnp.matmul(wp.astype(fdt), conv["fb"][0],
                        preferred_element_type=jnp.float32) \
            + conv["fb"][1]                             # (B, P, F)
        if sdt is not None:
            # narrow STORAGE of the filter output and its dense mirror (the
            # step's largest buffers); the aggregation contraction runs
            # compute_dtype inputs with an f32 accumulator
            w = (wp.astype(sdt)[:, pair_id].astype(compute_dtype)
                 * w_edge[..., None].astype(compute_dtype))
            return jnp.einsum("bijf,bjf->bif", w, x.astype(compute_dtype),
                              preferred_element_type=jnp.float32)
        w = wp[:, pair_id] * w_edge[..., None]          # (B, N, N, F)
        return jnp.einsum("bijf,bjf->bif", w, x)

    def pair_scores_packed(params6, h, e_packed, iu, ju, pair_id, mask,
                           sel=None):
        # h_i * h_j over unordered pairs only, then mirror via pair_id
        if sel is not None:
            # endpoint rows via one-hot MXU dots instead of gathers: exact
            # (each output row sums exactly one nonzero) and avoids the
            # P-major layout copies XLA inserts to feed the gathers
            # (tools/hlo_traffic.py); the concat is split into two matmuls
            # against the row-partitioned first layer (same math, two f32
            # accumulators instead of one).
            ei, ej = sel
            hi = jnp.einsum("pn,bnc->bpc", ei.astype(h.dtype), h,
                            preferred_element_type=jnp.float32).astype(
                h.dtype)
            hj = jnp.einsum("pn,bnc->bpc", ej.astype(h.dtype), h,
                            preferred_element_type=jnp.float32).astype(
                h.dtype)
            prod = hi * hj                              # (B, P, C)
            c = prod.shape[-1]
            x = act(prod @ params6[0][:c]
                    + e_packed.astype(prod.dtype) @ params6[0][c:]
                    + params6[1])
        else:
            prod = h[:, iu, :] * h[:, ju, :]            # (B, P, C)
            pair = jnp.concatenate(
                [prod, e_packed.astype(prod.dtype)], axis=-1
            )
            x = act(pair @ params6[0] + params6[1])
        y = act(x @ params6[2] + params6[3])
        packed = (jnp.matmul(y, params6[4],
                             preferred_element_type=jnp.float32)
                  + params6[5].astype(jnp.float32))[..., 0]  # (B, P)
        score = packed[:, pair_id]                      # (B, N, N) mirrored
        return jnp.where(mask, score, 0.0)

    def pair_scores(params6, h, edge_attr, mask):
        if use_pallas:
            return pair_score_mlp(
                h.astype(compute_dtype), edge_attr, mask,
                params6[0].astype(compute_dtype), params6[1],
                params6[2].astype(compute_dtype), params6[3],
                params6[4].astype(compute_dtype), params6[5],
                activation=cfg.mlp_act,
            )
        prod = h[:, :, None, :] * h[:, None, :, :]
        pair = jnp.concatenate([prod, edge_attr.astype(h.dtype)], axis=-1)
        x = act(pair @ params6[0] + params6[1])
        y = act(x @ params6[2] + params6[3])
        score = (y @ params6[4] + params6[5])[..., 0]
        return jnp.where(mask, score, 0.0)

    def schnet_block(blk, h, edge_attr, el, env_mask, *,
                     e_packed=None, pair_id=None,
                     w_cat=None, pair_id_ext=None, pk=None):
        """One dual-pathway interaction-block update h -> h (the reusable
        stage body: also the pipeline-parallel stage fn, parallel/pipeline).

        w_cat: precomputed packed filter block from stacked_filters_packed —
        (B, P, H + H/2), already multiplied by distance weight, envelope and
        edge mask. pair_id_ext mirrors it to dense with the diagonal mapped
        to the appended always-zero pair slot P."""
        c1, c2 = blk["convs"]
        if pk is not None:
            from agdiff_tpu.ops.pallas.block_packed import (
                packed_block_aggregate,
            )

            e_p, el_p, env_p = pk
            we1 = dweight(c1, el_p) * env_p              # (B, P) f32 —
            we2 = dweight(c2, el_p) * env_p              # XLA fuses these
            a1, a2 = packed_block_aggregate(
                e_p, we1, we2,
                node_input(c1, h).astype(e_p.dtype),
                node_input(c2, h).astype(e_p.dtype),
                c1, c2, softplus_fn=sp_fn,
            )
        elif w_cat is not None:
            x_cat = jnp.concatenate(
                [node_input(c1, h), node_input(c2, h)], axis=-1)
            w_ext = jnp.concatenate(
                [w_cat, jnp.zeros_like(w_cat[:, :1])], axis=1)
            w_dense = w_ext[:, pair_id_ext]              # (B, N, N, 192)
            agg = jnp.einsum("bijf,bjf->bif", w_dense,
                             x_cat.astype(w_dense.dtype))
            f1 = c1["fb"][0].shape[1]
            a1, a2 = agg[..., :f1], agg[..., f1:]
        elif use_pallas:
            a1, a2 = interaction_block_aggregate(
                edge_attr,
                dweight(c1, el) * env_mask,
                dweight(c2, el) * env_mask,
                node_input(c1, h), node_input(c2, h), c1, c2,
            )
        elif e_packed is not None:
            a1 = cf_pathway_packed(c1, h, e_packed, pair_id, el, env_mask)
            a2 = cf_pathway_packed(c2, h, e_packed, pair_id, el, env_mask)
        else:
            a1 = cf_pathway_xla(c1, h, edge_attr, el, env_mask)
            a2 = cf_pathway_xla(c2, h, edge_attr, el, env_mask)
        k, b = c1["lin2"]
        p1 = a1 @ k + b
        k, b = c2["lin2"]
        p2 = a2 @ k + b
        combined = ssp(jnp.concatenate([p1, p2], axis=-1),
                        blk["act_beta"])
        k, b = blk["lin"]
        combined = combined @ k + b
        k, b = blk["att0"]
        gate = jax.nn.relu(combined @ k + b)
        k, b = blk["att1"]
        gate = sig_fn(gate @ k + b)
        out = combined * gate
        out = out * sig_fn(
            jax.nn.relu(out @ blk["se0"]) @ blk["se1"]
        )
        return h + out

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
            n = dist.shape[-1]
            pair = (node_mask[:, :, None] & node_mask[:, None, :]
                    & ~jnp.eye(n, dtype=bool)[None])
            local_mask = (bond_adj > 0) & pair
            edge_mask = local_mask
            edge_type = jnp.where(edge_mask, bond_adj, 0).astype(jnp.int32)
        el = dist[..., None]

        n = dist.shape[-1]
        if pack_pairs:
            # static unordered-pair index sets for this bucket size
            iu_np, ju_np = np.triu_indices(n, k=1)
            pair_id_np = np.zeros((n, n), np.int32)
            pair_id_np[iu_np, ju_np] = np.arange(len(iu_np))
            pair_id_np = pair_id_np + pair_id_np.T  # diagonal -> pair 0 (masked)
            iu, ju = jnp.asarray(iu_np), jnp.asarray(ju_np)
            pair_id = jnp.asarray(pair_id_np)
            sel = None
            if score_dots:
                p_n = len(iu_np)
                ei_np = np.zeros((p_n, n), np.float32)
                ej_np = np.zeros((p_n, n), np.float32)
                ei_np[np.arange(p_n), iu_np] = 1.0
                ej_np[np.arange(p_n), ju_np] = 1.0
                sel = (jnp.asarray(ei_np), jnp.asarray(ej_np))
            if stack_filters:
                # diagonal -> the appended always-zero pair slot P
                pid_ext_np = pair_id_np.copy()
                np.fill_diagonal(pid_ext_np, len(iu_np))
                pair_id_ext = jnp.asarray(pid_ext_np)
            el_packed = dist[:, iu, ju][..., None]        # (B, P, 1)
            type_packed = edge_type[:, iu, ju]            # (B, P)
            e_packed = encode(ee, el_packed, type_packed).astype(
                compute_dtype)
            edge_attr = e_packed[:, pair_id, :]           # dense mirror
            if ee_local is None:
                e_packed_local, edge_attr_local = e_packed, edge_attr
            else:
                e_packed_local = encode(
                    ee_local, el_packed, type_packed).astype(compute_dtype)
                edge_attr_local = e_packed_local[:, pair_id, :]
            if sdt is not None:
                # the GIN message mirror is read by every GIN layer; store
                # it narrow (the adds below upcast to compute_dtype)
                edge_attr_local = e_packed_local.astype(sdt)[:, pair_id, :]
        else:
            edge_attr = encode(ee, el, edge_type).astype(compute_dtype)
            edge_attr_local = (
                edge_attr if ee_local is None
                else encode(ee_local, el, edge_type).astype(compute_dtype)
            )

        # --- SchNet global branch ---
        h = _embed_lookup(schnet_emb, batch.atom_type, cfg.embedding_max_norm)
        env_mask = envelope(dist, cfg) * edge_mask
        if stack_filters:
            w_cats = stacked_filters_packed(
                e_packed, el_packed, edge_mask[:, iu, ju])
            for blk, w_cat in zip(blocks, w_cats):
                h = schnet_block(blk, h, edge_attr, el, env_mask,
                                 w_cat=w_cat, pair_id_ext=pair_id_ext)
        elif packed_stack:
            from agdiff_tpu.ops.pallas.stack_packed import (
                packed_stack_forward,
            )

            env_p = (envelope(el_packed[..., 0], cfg)
                     * edge_mask[:, iu, ju].astype(jnp.float32))
            we = stacked_distance_weights(blocks, el_packed, env_p,
                                          sigmoid=sig_fn)
            ext = {}
            if packed_stack != "schnet":
                ext = dict(e_packed_local=e_packed_local,
                           local_mask_p=local_mask[:, iu, ju],
                           hl0=gin_emb[batch.atom_type],
                           gin_layers=gin_layers)
            if packed_stack == "full":
                ext.update(grad_global=grad_global, grad_local=grad_local,
                           act_fn=act)
            res = packed_stack_forward(
                e_packed, we, h.astype(jnp.float32), blocks,
                mode=packed_stack, softplus_fn=sp_fn, sigmoid_fn=sig_fn,
                **ext)
            if packed_stack == "schnet":
                h = res
            elif packed_stack == "gin":
                h, hl_kernel = res
            else:
                sg_plane, sl_plane = res
        elif packed_kernel:
            env_p = (envelope(el_packed[..., 0], cfg)
                     * edge_mask[:, iu, ju].astype(jnp.float32))
            pk_ctx = (e_packed, el_packed, env_p)
            for blk in blocks:
                h = schnet_block(blk, h, edge_attr, el, env_mask, pk=pk_ctx)
        else:
            for blk in blocks:
                h = schnet_block(blk, h, edge_attr, el, env_mask,
                                 e_packed=e_packed if pack_pairs else None,
                                 pair_id=pair_id if pack_pairs else None)

        if packed_stack == "full":
            edge_inv_global = jnp.where(edge_mask, sg_plane[:, pair_id],
                                        0.0)
            edge_inv_local = jnp.where(local_mask, sl_plane[:, pair_id],
                                       0.0)
            return ModelOutput(
                edge_inv_global=edge_inv_global,
                edge_inv_local=edge_inv_local,
                edge_mask=edge_mask,
                edge_type=edge_type,
                edge_length=dist,
                local_mask=local_mask,
            )

        if pack_pairs:
            edge_inv_global = pair_scores_packed(
                grad_global, h.astype(compute_dtype), e_packed, iu, ju,
                pair_id, edge_mask, sel=sel,
            )
        else:
            edge_inv_global = pair_scores(grad_global, h, edge_attr,
                                          edge_mask)

        # --- GIN local branch ---
        hl = (hl_kernel if packed_stack == "gin"
              else gin_emb[batch.atom_type])
        for i, layer in enumerate(gin_layers if packed_stack != "gin"
                                  else []):
            if sdt is not None:
                msg = jax.nn.relu(hl[:, None, :, :].astype(compute_dtype)
                                  + edge_attr_local.astype(compute_dtype))
                agg = jnp.einsum(
                    "bij,bijh->bih", local_mask.astype(compute_dtype), msg,
                    preferred_element_type=jnp.float32,
                )
            elif use_pallas and compute_dtype == jnp.float32:
                # bf16 GINE blocks fail Mosaic layout inference on this
                # toolchain; bf16 mode uses the XLA path below instead
                agg = gine_aggregate(hl.astype(compute_dtype),
                                     edge_attr_local, local_mask,
                                     activation="relu")
            else:
                msg = jax.nn.relu(hl[:, None, :, :].astype(jnp.float32)
                                  + edge_attr_local.astype(jnp.float32))
                agg = jnp.einsum(
                    "bij,bijh->bih", local_mask.astype(msg.dtype), msg
                )
            out = hl + agg
            k, b = layer["l0"]
            out = jax.nn.relu(out @ k + b)
            k, b = layer["l1"]
            out = out @ k + b  # BN folded in
            if i < len(gin_layers) - 1:
                out = jax.nn.relu(out)
            hl = out + hl

        if pack_pairs:
            edge_inv_local = pair_scores_packed(
                grad_local, hl.astype(compute_dtype), e_packed_local, iu, ju,
                pair_id, local_mask, sel=sel,
            )
        else:
            edge_inv_local = pair_scores(grad_local, hl, edge_attr_local,
                                         local_mask)

        return ModelOutput(
            edge_inv_global=edge_inv_global,
            edge_inv_local=edge_inv_local,
            edge_mask=edge_mask,
            edge_type=edge_type,
            edge_length=dist,
            local_mask=local_mask,
        )

    # expose the stage body + folded per-block params for pipeline
    # parallelism (parallel/pipeline.schnet_pipeline_stage)
    forward.schnet_block = schnet_block
    forward.schnet_blocks = blocks
    return forward
