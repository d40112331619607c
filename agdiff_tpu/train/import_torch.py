"""Import reference (PyTorch) AGDIFF checkpoints into agdiff_tpu.

The reference saves `torch.save({"model": state_dict, "config": EasyDict,
...})` (reference: scripts/train.py:218-231). This module maps that
state_dict onto our flax parameter/batch-stats trees so a trained reference
model can be sampled/evaluated with this framework directly.

Name mapping (reference module tree -> our scopes):
  edge_encoder_global.*            -> params/edge_encoder_global/*
  encoder_global.interactions.N.*  -> params/encoder_global/interactions_N/*
  encoder_global.scaling_modules.N.fc.{0,2} -> scaling_modules_N/fc_{0,1}
  encoder_local.convs.N.nn.layers.M -> encoder_local/convs_N/nn/layers_M
  grad_{global,local}_dist_mlp.layers.M -> layers_M
Torch Linear weights are (out, in) -> transposed to flax (in, out);
BatchNorm running stats land in the batch_stats collection. Dead reference
parameters (CFConv.attention.*, the never-trained edge_encoder_local when
tied) are skipped.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from agdiff_tpu.config import ModelConfig


def _t(x) -> np.ndarray:
    try:
        import torch

        if isinstance(x, torch.Tensor):
            return x.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(x)


class _TreeBuilder:
    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.stats: Dict[str, Any] = {}

    def put(self, tree, path, value):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = np.asarray(value)

    def linear(self, scope, weight, bias=None):
        self.put(self.params, scope + ("kernel",), _t(weight).T)
        if bias is not None:
            self.put(self.params, scope + ("bias",), _t(bias))

    def embed(self, scope, weight):
        self.put(self.params, scope + ("embedding",), _t(weight))

    def bn(self, scope, sd, prefix):
        self.put(self.params, scope + ("scale",), _t(sd[prefix + ".weight"]))
        self.put(self.params, scope + ("bias",), _t(sd[prefix + ".bias"]))
        self.put(self.stats, scope + ("mean",), _t(sd[prefix + ".running_mean"]))
        self.put(self.stats, scope + ("var",), _t(sd[prefix + ".running_var"]))


def _import_edge_encoder(b: _TreeBuilder, sd, src: str, dst: str):
    s = (dst,)
    b.embed(s + ("bond_emb",), sd[f"{src}.bond_emb.weight"])
    b.linear(s + ("feature_expansion",), sd[f"{src}.feature_expansion.weight"],
             sd[f"{src}.feature_expansion.bias"])
    for our, theirs in (("edge_feature_mlp_0", "edge_feature_mlp.0"),
                        ("edge_feature_mlp_1", "edge_feature_mlp.2"),
                        ("combination_mlp_0", "combination_mlp.0"),
                        ("combination_mlp_1", "combination_mlp.2"),
                        ("attention_0", "attention.0"),
                        ("attention_1", "attention.2")):
        b.linear(s + (our,), sd[f"{src}.{theirs}.weight"],
                 sd[f"{src}.{theirs}.bias"])


def _import_cfconv(b: _TreeBuilder, sd, src: str, scope: Tuple[str, ...]):
    b.linear(scope + ("filter_0",), sd[f"{src}.nn.0.weight"],
             sd[f"{src}.nn.0.bias"])
    b.put(b.params, scope + ("filter_act", "beta"),
          _t(sd[f"{src}.nn.1.beta"]).reshape(()))
    b.linear(scope + ("filter_1",), sd[f"{src}.nn.2.weight"],
             sd[f"{src}.nn.2.bias"])
    b.linear(scope + ("distance_weighting", "layer1"),
             sd[f"{src}.distance_weighting.layer1.weight"],
             sd[f"{src}.distance_weighting.layer1.bias"])
    b.linear(scope + ("distance_weighting", "layer2"),
             sd[f"{src}.distance_weighting.layer2.weight"],
             sd[f"{src}.distance_weighting.layer2.bias"])
    b.linear(scope + ("lin1",), sd[f"{src}.lin1.weight"],
             sd[f"{src}.lin1.bias"])
    b.linear(scope + ("lin2",), sd[f"{src}.lin2.weight"],
             sd[f"{src}.lin2.bias"])
    b.bn(scope + ("norm1",), sd, f"{src}.norm1")
    b.bn(scope + ("norm2",), sd, f"{src}.norm2")


def import_reference_state_dict(
    state_dict: Dict[str, Any], config: ModelConfig
) -> Dict[str, Any]:
    """Reference state_dict -> {'params': ..., 'batch_stats': ...}."""
    sd = state_dict
    b = _TreeBuilder()

    _import_edge_encoder(b, sd, "edge_encoder_global", "edge_encoder_global")
    if not config.tie_edge_encoders and any(
        k.startswith("edge_encoder_local.") for k in sd
    ):
        _import_edge_encoder(b, sd, "edge_encoder_local", "edge_encoder_local")

    # --- SchNet ---
    g = ("encoder_global",)
    b.embed(g + ("embedding",), sd["encoder_global.embedding.weight"])
    for i in range(config.num_convs):
        blk = f"encoder_global.interactions.{i}"
        scope = g + (f"interactions_{i}",)
        _import_cfconv(b, sd, f"{blk}.conv1", scope + ("conv1",))
        _import_cfconv(b, sd, f"{blk}.conv2", scope + ("conv2",))
        b.put(b.params, scope + ("act", "beta"),
              _t(sd[f"{blk}.act.beta"]).reshape(()))
        b.linear(scope + ("lin",), sd[f"{blk}.lin.weight"],
                 sd[f"{blk}.lin.bias"])
        b.linear(scope + ("attention_0",), sd[f"{blk}.attention.0.weight"],
                 sd[f"{blk}.attention.0.bias"])
        b.linear(scope + ("attention_1",), sd[f"{blk}.attention.2.weight"],
                 sd[f"{blk}.attention.2.bias"])
        se = f"encoder_global.scaling_modules.{i}"
        b.linear(g + (f"scaling_modules_{i}", "fc_0"), sd[f"{se}.fc.0.weight"])
        b.linear(g + (f"scaling_modules_{i}", "fc_1"), sd[f"{se}.fc.2.weight"])

    # --- GIN ---
    l = ("encoder_local",)
    b.embed(l + ("node_emb",), sd["encoder_local.node_emb.weight"])
    for i in range(config.num_convs_local):
        conv = f"encoder_local.convs.{i}"
        for m in (0, 1):
            b.linear(l + (f"convs_{i}", "nn", f"layers_{m}"),
                     sd[f"{conv}.nn.layers.{m}.weight"],
                     sd[f"{conv}.nn.layers.{m}.bias"])
        b.bn(l + (f"batch_norms_{i}",), sd, f"encoder_local.batch_norms.{i}")

    # --- grad MLPs ---
    for name in ("grad_global_dist_mlp", "grad_local_dist_mlp"):
        for m in range(3):
            b.linear((name, f"layers_{m}"), sd[f"{name}.layers.{m}.weight"],
                     sd[f"{name}.layers.{m}.bias"])

    return {"params": b.params, "batch_stats": b.stats}


def load_reference_checkpoint(path: str):
    """Load a reference .pt checkpoint file -> (variables, ModelConfig).

    Requires torch. The embedded EasyDict config is read tolerantly (pickled
    class shimmed if easydict is not installed)."""
    import io
    import pickle

    import torch

    class _EasyDictShim(dict):
        def __setstate__(self, state):
            self.update(state if isinstance(state, dict) else {})

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.startswith("easydict"):
                return _EasyDictShim
            return super().find_class(module, name)

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=False,
                          pickle_module=None)
    except Exception:
        with open(path, "rb") as f:
            ckpt = torch.load(
                io.BytesIO(f.read()), map_location="cpu", weights_only=False
            )
    raw_model_cfg = dict(ckpt["config"]["model"]) if "config" in ckpt else {}
    known = {f.name for f in __import__("dataclasses").fields(ModelConfig)}
    config = ModelConfig(**{k: v for k, v in raw_model_cfg.items()
                            if k in known})
    variables = import_reference_state_dict(ckpt["model"], config)
    return variables, config


# ---------------------------------------------------------------------------
# Export (inverse mapping): our variables -> reference-style state_dict
# ---------------------------------------------------------------------------

def _flat_items(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flat_items(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def export_reference_state_dict(variables, config: ModelConfig):
    """Our {'params', 'batch_stats'} -> a reference-layout torch state_dict
    (so models trained here can be loaded by the PyTorch reference).

    The reference loads checkpoints with a STRICT load_state_dict
    (scripts/test.py:112, scripts/train.py:111), so the export must contain
    every key of the real module tree, including parameters that get no
    compute there: the never-used edge_encoder_local (dualenc.py:65 vs 214),
    the dead CFConv AttentionModule (schnet.py:126), the GINEConv eps buffer
    (gin.py:33-36), and the betas/alphas schedule buffers (dualenc.py:115-126).
    """
    import torch

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out = {}

    def put_linear(dst, scope):
        node = params
        for k in scope:
            node = node[k]
        out[dst + ".weight"] = torch.from_numpy(
            np.asarray(node["kernel"]).T.copy())
        if "bias" in node:
            out[dst + ".bias"] = torch.from_numpy(np.asarray(node["bias"]))

    def put_embed(dst, scope):
        node = params
        for k in scope:
            node = node[k]
        out[dst + ".weight"] = torch.from_numpy(
            np.asarray(node["embedding"]))

    def put_bn(dst, scope):
        pnode, snode = params, stats
        for k in scope:
            pnode, snode = pnode[k], snode[k]
        out[dst + ".weight"] = torch.from_numpy(np.asarray(pnode["scale"]))
        out[dst + ".bias"] = torch.from_numpy(np.asarray(pnode["bias"]))
        out[dst + ".running_mean"] = torch.from_numpy(np.asarray(snode["mean"]))
        out[dst + ".running_var"] = torch.from_numpy(np.asarray(snode["var"]))
        out[dst + ".num_batches_tracked"] = torch.tensor(0)

    def put_scalar(dst, scope):
        node = params
        for k in scope:
            node = node[k]
        out[dst] = torch.from_numpy(np.asarray(node).reshape(()).copy()
                                    ).reshape(())

    def edge_encoder(src, dst):
        put_embed(f"{dst}.bond_emb", (src, "bond_emb"))
        put_linear(f"{dst}.feature_expansion", (src, "feature_expansion"))
        for ours, theirs in (("edge_feature_mlp_0", "edge_feature_mlp.0"),
                             ("edge_feature_mlp_1", "edge_feature_mlp.2"),
                             ("combination_mlp_0", "combination_mlp.0"),
                             ("combination_mlp_1", "combination_mlp.2"),
                             ("attention_0", "attention.0"),
                             ("attention_1", "attention.2")):
            put_linear(f"{dst}.{theirs}", (src, ours))

    edge_encoder("edge_encoder_global", "edge_encoder_global")
    if "edge_encoder_local" in params:
        edge_encoder("edge_encoder_local", "edge_encoder_local")
    else:
        # tied encoders (the reference trains only the global one anyway,
        # dualenc.py:214): emit a copy so the reference's strict load passes
        edge_encoder("edge_encoder_global", "edge_encoder_local")

    put_embed("encoder_global.embedding", ("encoder_global", "embedding"))
    for i in range(config.num_convs):
        src = ("encoder_global", f"interactions_{i}")
        dst = f"encoder_global.interactions.{i}"
        for conv in ("conv1", "conv2"):
            put_linear(f"{dst}.{conv}.nn.0", src + (conv, "filter_0"))
            put_scalar(f"{dst}.{conv}.nn.1.beta", src + (conv, "filter_act", "beta"))
            put_linear(f"{dst}.{conv}.nn.2", src + (conv, "filter_1"))
            put_linear(f"{dst}.{conv}.distance_weighting.layer1",
                       src + (conv, "distance_weighting", "layer1"))
            put_linear(f"{dst}.{conv}.distance_weighting.layer2",
                       src + (conv, "distance_weighting", "layer2"))
            put_linear(f"{dst}.{conv}.lin1", src + (conv, "lin1"))
            put_linear(f"{dst}.{conv}.lin2", src + (conv, "lin2"))
            put_bn(f"{dst}.{conv}.norm1", src + (conv, "norm1"))
            put_bn(f"{dst}.{conv}.norm2", src + (conv, "norm2"))
        put_scalar(f"{dst}.act.beta", src + ("act", "beta"))
        put_linear(f"{dst}.lin", src + ("lin",))
        put_linear(f"{dst}.attention.0", src + ("attention_0",))
        put_linear(f"{dst}.attention.2", src + ("attention_1",))
        put_linear(f"encoder_global.scaling_modules.{i}.fc.0",
                   ("encoder_global", f"scaling_modules_{i}", "fc_0"))
        put_linear(f"encoder_global.scaling_modules.{i}.fc.2",
                   ("encoder_global", f"scaling_modules_{i}", "fc_1"))
        # dead CFConv AttentionModule (schnet.py:103-110, 126): present in
        # every real checkpoint, never used in forward
        out[f"{dst}.conv1.attention.attention_weights"] = torch.zeros(
            config.hidden_dim)
        out[f"{dst}.conv2.attention.attention_weights"] = torch.zeros(
            config.hidden_dim // 2)

    put_embed("encoder_local.node_emb", ("encoder_local", "node_emb"))
    for i in range(config.num_convs_local):
        # eps buffer (gin.py:33-36, train_eps=False -> saved as 0.0)
        out[f"encoder_local.convs.{i}.eps"] = torch.zeros(1)
        for m in (0, 1):
            put_linear(f"encoder_local.convs.{i}.nn.layers.{m}",
                       ("encoder_local", f"convs_{i}", "nn", f"layers_{m}"))
        put_bn(f"encoder_local.batch_norms.{i}",
               ("encoder_local", f"batch_norms_{i}"))

    for name in ("grad_global_dist_mlp", "grad_local_dist_mlp"):
        for m in range(3):
            put_linear(f"{name}.layers.{m}", (name, f"layers_{m}"))

    # schedule buffers saved as non-trainable nn.Parameters
    # (dualenc.py:115-126): betas float32 + alphas = cumprod(1 - betas)
    from agdiff_tpu.models.schedules import get_beta_schedule

    betas = get_beta_schedule(
        config.beta_schedule, beta_start=config.beta_start,
        beta_end=config.beta_end,
        num_diffusion_timesteps=config.num_diffusion_timesteps,
    ).astype(np.float32)
    out["betas"] = torch.from_numpy(betas)
    # torch cumprod, not numpy: bit-exact with the reference's float32
    # `(1.0 - betas).cumprod(dim=0)`
    out["alphas"] = torch.cumprod(1.0 - out["betas"], dim=0)

    return out
