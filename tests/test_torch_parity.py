"""Golden numerical parity: our dense-masked JAX model vs a pure-torch
edge-list implementation of the reference math (tests/torch_reference.py),
with weights transplanted from the flax parameter tree.

This is the strongest check that the TPU-native rewrite computes the SAME
function as the reference architecture (src/agdiff/models/...), despite the
completely different batching/graph representation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from agdiff_tpu.config import ModelConfig
from agdiff_tpu.data.bucketing import pad_molecules
from agdiff_tpu.data.synthetic import synthetic_dataset
from agdiff_tpu.data.transforms import extend_bond_order
from agdiff_tpu.models.dualenc import get_model

import torch_reference as tref


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _copy_linear(dst: "torch.nn.Linear", params):
    dst.weight.data = t(params["kernel"]).T.contiguous()
    if "bias" in params:
        dst.bias.data = t(params["bias"])


def _copy_bn(dst: "torch.nn.BatchNorm1d", params, stats):
    dst.weight.data = t(params["scale"])
    dst.bias.data = t(params["bias"])
    dst.running_mean.data = t(stats["mean"])
    dst.running_var.data = t(stats["var"])


def _copy_edge_encoder(dst: tref.MLPEdgeEncoder, p):
    dst.bond_emb.weight.data = t(p["bond_emb"]["embedding"])
    _copy_linear(dst.feature_expansion, p["feature_expansion"])
    _copy_linear(dst.edge_feature_mlp[0], p["edge_feature_mlp_0"])
    _copy_linear(dst.edge_feature_mlp[2], p["edge_feature_mlp_1"])
    _copy_linear(dst.combination_mlp[0], p["combination_mlp_0"])
    _copy_linear(dst.combination_mlp[2], p["combination_mlp_1"])
    _copy_linear(dst.attention[0], p["attention_0"])
    _copy_linear(dst.attention[2], p["attention_1"])


def _copy_cfconv(dst: tref.CFConv, p, s):
    _copy_linear(dst.nn[0], p["filter_0"])
    dst.nn[1].beta.data = t(p["filter_act"]["beta"]).reshape(())
    _copy_linear(dst.nn[2], p["filter_1"])
    _copy_linear(dst.distance_weighting.layer1,
                 p["distance_weighting"]["layer1"])
    _copy_linear(dst.distance_weighting.layer2,
                 p["distance_weighting"]["layer2"])
    _copy_linear(dst.lin1, p["lin1"])
    _copy_linear(dst.lin2, p["lin2"])
    _copy_bn(dst.norm1, p["norm1"], s["norm1"])
    _copy_bn(dst.norm2, p["norm2"], s["norm2"])


def _copy_schnet(dst: tref.SchNetEncoder, p, s, num_interactions):
    dst.embedding.weight.data = t(p["embedding"]["embedding"])
    for i in range(num_interactions):
        ip, istats = p[f"interactions_{i}"], s[f"interactions_{i}"]
        blk = dst.interactions[i]
        _copy_cfconv(blk.conv1, ip["conv1"], istats["conv1"])
        _copy_cfconv(blk.conv2, ip["conv2"], istats["conv2"])
        blk.act.beta.data = t(ip["act"]["beta"]).reshape(())
        _copy_linear(blk.lin, ip["lin"])
        _copy_linear(blk.attention[0], ip["attention_0"])
        _copy_linear(blk.attention[2], ip["attention_1"])
        sp = p[f"scaling_modules_{i}"]
        _copy_linear(dst.scaling_modules[i].fc[0], sp["fc_0"])
        _copy_linear(dst.scaling_modules[i].fc[2], sp["fc_1"])


def _copy_gin(dst: tref.GINEncoder, p, s, num_convs):
    dst.node_emb.weight.data = t(p["node_emb"]["embedding"])
    for i in range(num_convs):
        cp = p[f"convs_{i}"]["nn"]
        _copy_linear(dst.convs[i].nn.layers[0], cp["layers_0"])
        _copy_linear(dst.convs[i].nn.layers[1], cp["layers_1"])
        _copy_bn(dst.batch_norms[i], p[f"batch_norms_{i}"],
                 s[f"batch_norms_{i}"])


def _copy_mlp(dst: tref.MultiLayerPerceptron, p):
    for i in range(len(dst.layers)):
        _copy_linear(dst.layers[i], p[f"layers_{i}"])


def transplant(variables, cfg: ModelConfig) -> tref.DualEncoderEpsNetwork:
    p = variables["params"]
    s = variables["batch_stats"]
    model = tref.DualEncoderEpsNetwork(
        hidden_dim=cfg.hidden_dim, num_convs=cfg.num_convs,
        num_convs_local=cfg.num_convs_local, cutoff=cfg.cutoff,
        smooth=cfg.smooth_conv, mlp_act=cfg.mlp_act,
    )
    _copy_edge_encoder(model.edge_encoder_global, p["edge_encoder_global"])
    _copy_schnet(model.encoder_global, p["encoder_global"],
                 s["encoder_global"], cfg.num_convs)
    _copy_gin(model.encoder_local, p["encoder_local"], s["encoder_local"],
              cfg.num_convs_local)
    _copy_mlp(model.grad_global_dist_mlp, p["grad_global_dist_mlp"])
    _copy_mlp(model.grad_local_dist_mlp, p["grad_local_dist_mlp"])
    return model


def working_graph(mol, pos, cutoff=10.0, edge_order=3):
    """Host-side edge list of the working graph (extended bonds u radius),
    row-major order — the same graph the dense model masks define."""
    n = mol.num_nodes
    ext = extend_bond_order(mol.bond_adjacency(), order=edge_order)
    dist = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    mask = ((dist <= cutoff) | (ext > 0)) & ~np.eye(n, dtype=bool)
    i, j = np.nonzero(mask)
    edge_index = np.stack([i, j]).astype(np.int64)
    edge_type = ext[i, j].astype(np.int64)
    return edge_index, edge_type


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(hidden_dim=32, num_convs=2, num_convs_local=2,
                      num_diffusion_timesteps=100)
    mol = synthetic_dataset(1, seed=11, min_heavy=4, max_heavy=5)[0]
    batch = pad_molecules([mol], mol.num_nodes, batch_size=1)
    model = get_model(cfg)
    variables = model.init(jax.random.PRNGKey(3), batch, train=False)
    tmodel = transplant(variables, cfg)
    tmodel.eval()
    return cfg, mol, batch, model, variables, tmodel


class TestFullForwardParity:
    def test_eval_mode_edge_scores_match(self, setup):
        cfg, mol, batch, model, variables, tmodel = setup
        out = model.apply(variables, batch, train=False)

        pos = np.asarray(batch.pos[0])[: mol.num_nodes]
        edge_index, edge_type = working_graph(mol, pos, cfg.cutoff)
        with torch.no_grad():
            g, l, el, lmask = tmodel(
                torch.from_numpy(mol.atom_type.astype(np.int64)),
                t(pos), torch.from_numpy(edge_index),
                torch.from_numpy(edge_type),
            )
        i, j = edge_index
        ours_g = np.asarray(out.edge_inv_global)[0][i, j]
        np.testing.assert_allclose(ours_g, g.numpy()[:, 0], atol=2e-4)

        li, lj = edge_index[:, edge_type > 0]
        ours_l = np.asarray(out.edge_inv_local)[0][li, lj]
        np.testing.assert_allclose(ours_l, l.numpy()[:, 0], atol=2e-4)

    def test_eval_mode_parity_with_padding(self, setup):
        """Same molecule padded into a larger bucket with an extra padding
        graph — real-edge scores must still match torch exactly."""
        cfg, mol, _, model, variables, tmodel = setup
        padded = pad_molecules([mol], mol.num_nodes + 7, batch_size=2)
        out = model.apply(variables, padded, train=False)
        pos = np.asarray(padded.pos[0])[: mol.num_nodes]
        edge_index, edge_type = working_graph(mol, pos, cfg.cutoff)
        with torch.no_grad():
            g, _, _, _ = tmodel(
                torch.from_numpy(mol.atom_type.astype(np.int64)),
                t(pos), torch.from_numpy(edge_index),
                torch.from_numpy(edge_type),
            )
        i, j = edge_index
        ours = np.asarray(out.edge_inv_global)[0][i, j]
        np.testing.assert_allclose(ours, g.numpy()[:, 0], atol=2e-4)

    def test_train_mode_batchnorm_parity(self, setup):
        """Train-mode BN statistics over real nodes must match torch
        BatchNorm1d over the concatenated node list — including when the
        padded batch contains pad nodes (the hard case, SURVEY.md 7.3.1)."""
        cfg, mol, _, model, variables, tmodel = setup
        padded = pad_molecules([mol], mol.num_nodes + 5, batch_size=1)
        out, mutated = model.apply(
            variables, padded, train=True, mutable=["batch_stats"]
        )
        tmodel_train = transplant(variables, cfg)
        tmodel_train.train()
        pos = np.asarray(padded.pos[0])[: mol.num_nodes]
        edge_index, edge_type = working_graph(mol, pos, cfg.cutoff)
        with torch.no_grad():
            g, l, _, _ = tmodel_train(
                torch.from_numpy(mol.atom_type.astype(np.int64)),
                t(pos), torch.from_numpy(edge_index),
                torch.from_numpy(edge_type),
            )
        i, j = edge_index
        ours = np.asarray(out.edge_inv_global)[0][i, j]
        np.testing.assert_allclose(ours, g.numpy()[:, 0], atol=3e-4)

        # running stats after one train step match torch's momentum update
        ours_bn = mutated["batch_stats"]["encoder_global"]["interactions_0"][
            "conv1"]["norm1"]
        torch_bn = tmodel_train.encoder_global.interactions[0].conv1.norm1
        np.testing.assert_allclose(
            np.asarray(ours_bn["mean"]), torch_bn.running_mean.numpy(),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(ours_bn["var"]), torch_bn.running_var.numpy(),
            atol=1e-5,
        )


class TestLayerParity:
    def test_shifted_softplus(self):
        from agdiff_tpu.nn.common import ShiftedSoftplus as JSSP

        x = np.linspace(-5, 5, 101).astype(np.float32)
        mod = JSSP()
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = {"params": {"beta": jnp.asarray(1.7)}}
        ours = np.asarray(mod.apply(variables, jnp.asarray(x)))
        tmod = tref.ShiftedSoftplus()
        tmod.beta.data = torch.tensor(1.7)
        with torch.no_grad():
            golden = tmod(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(ours, golden, atol=1e-6)

    def test_masked_batchnorm_vs_torch(self):
        from agdiff_tpu.nn.common import MaskedBatchNorm

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 7, 5)).astype(np.float32) * 3 + 1
        mask = np.ones((2, 7), bool)
        mask[0, 5:] = False  # padding
        mod = MaskedBatchNorm(5)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                             jnp.asarray(mask), True)
        ours, mutated = mod.apply(
            variables, jnp.asarray(x), jnp.asarray(mask), True,
            mutable=["batch_stats"],
        )
        tbn = torch.nn.BatchNorm1d(5)
        tbn.train()
        real = x[mask]  # concatenated real nodes
        with torch.no_grad():
            golden = tbn(torch.from_numpy(real)).numpy()
        np.testing.assert_allclose(
            np.asarray(ours)[np.asarray(mask)], golden, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["mean"]),
            tbn.running_mean.numpy(), atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["var"]),
            tbn.running_var.numpy(), atol=1e-5,
        )
        # padded rows are zeroed
        assert (np.asarray(ours)[~np.asarray(mask)] == 0).all()
