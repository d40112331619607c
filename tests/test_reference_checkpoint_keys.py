"""Checkpoint interop against the GENUINE reference key set.

A real `torch.save` from the reference (scripts/train.py:218-231) contains
keys that never appear in our flax tree: the never-used edge_encoder_local
(dualenc.py:65 vs 214), the dead CFConv AttentionModule
(encoder/schnet.py:103-110, 126), the GINEConv eps buffer (encoder/gin.py:
33-36), BatchNorm num_batches_tracked counters, and the betas/alphas
schedule buffers saved as non-trainable nn.Parameters (dualenc.py:115-126).

These tests build the EXACT key inventory of the reference QM9 model
(hidden 128, 6 SchNet + 4 GIN convs) straight from reading the reference
source, then prove:
  1. the inventory is what we claim (explicit name->shape table),
  2. the importer accounts for EVERY real key (consumed or documented-dead),
  3. forward parity holds end-to-end from a genuine-layout state_dict,
  4. the export produces a state_dict the reference can strict-load, and
     import(export(v)) is bit-exact.
"""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from agdiff_tpu.config import ModelConfig
from agdiff_tpu.data.bucketing import pad_molecules
from agdiff_tpu.data.synthetic import synthetic_dataset
from agdiff_tpu.models.dualenc import get_model
from agdiff_tpu.models.schedules import get_beta_schedule
from agdiff_tpu.train.import_torch import (
    export_reference_state_dict,
    import_reference_state_dict,
)

import torch_reference as tref
from test_torch_parity import working_graph

H = 128          # hidden_dim (configs/qm9_default.yml:2)
NC = 6           # num_convs (yml:4)
NL = 4           # num_convs_local (yml:5)
T = 5000         # num_diffusion_timesteps (yml:12)


def _edge_encoder_keys(prefix):
    """MLPEdgeEncoder parameter inventory (encoder/edge.py:45-78)."""
    ks = {
        f"{prefix}.bond_emb.weight": (100, H),
        f"{prefix}.feature_expansion.weight": (H, 1),
        f"{prefix}.feature_expansion.bias": (H,),
    }
    for seq, dims in (("edge_feature_mlp", [(H, 2 * H), (H, H)]),
                      ("combination_mlp", [(H, 2 * H), (H, H)]),
                      ("attention", [(H, H), (1, H)])):
        for slot, (o, i) in zip((0, 2), dims):
            ks[f"{prefix}.{seq}.{slot}.weight"] = (o, i)
            ks[f"{prefix}.{seq}.{slot}.bias"] = (o,)
    return ks


def _bn_keys(prefix, c):
    return {
        f"{prefix}.weight": (c,), f"{prefix}.bias": (c,),
        f"{prefix}.running_mean": (c,), f"{prefix}.running_var": (c,),
        f"{prefix}.num_batches_tracked": (),
    }


def _cfconv_keys(prefix, nf):
    """CFConv inventory (encoder/schnet.py:115-131): filter mlp `nn`
    (Linear/ShiftedSoftplus/Linear), lin1/lin2 + BatchNorms, dead
    AttentionModule, DistanceWeightingNetwork(32)."""
    ks = {
        f"{prefix}.nn.0.weight": (nf, H), f"{prefix}.nn.0.bias": (nf,),
        f"{prefix}.nn.1.beta": (),
        f"{prefix}.nn.2.weight": (nf, nf), f"{prefix}.nn.2.bias": (nf,),
        f"{prefix}.lin1.weight": (nf, H), f"{prefix}.lin1.bias": (nf,),
        f"{prefix}.lin2.weight": (H, nf), f"{prefix}.lin2.bias": (H,),
        f"{prefix}.attention.attention_weights": (nf,),   # DEAD (schnet.py:126)
        f"{prefix}.distance_weighting.layer1.weight": (32, 1),
        f"{prefix}.distance_weighting.layer1.bias": (32,),
        f"{prefix}.distance_weighting.layer2.weight": (1, 32),
        f"{prefix}.distance_weighting.layer2.bias": (1,),
    }
    ks.update(_bn_keys(f"{prefix}.norm1", nf))
    ks.update(_bn_keys(f"{prefix}.norm2", H))
    return ks


def expected_reference_keys():
    """The full name->shape inventory of a reference QM9 checkpoint's
    state_dict, written line-by-line from the reference source."""
    ks = {"betas": (T,), "alphas": (T,)}          # dualenc.py:115-126
    ks.update(_edge_encoder_keys("edge_encoder_global"))   # dualenc.py:64
    ks.update(_edge_encoder_keys("edge_encoder_local"))    # dualenc.py:65 (dead)
    ks["encoder_global.embedding.weight"] = (100, H)       # schnet.py:254
    for i in range(NC):
        blk = f"encoder_global.interactions.{i}"
        ks.update(_cfconv_keys(f"{blk}.conv1", H))         # schnet.py:186-188
        ks.update(_cfconv_keys(f"{blk}.conv2", H // 2))    # schnet.py:189-191
        ks[f"{blk}.act.beta"] = ()                         # schnet.py:193
        ks[f"{blk}.lin.weight"] = (H, 256)                 # schnet.py:195 (256 hardcode)
        ks[f"{blk}.lin.bias"] = (H,)
        ks[f"{blk}.attention.0.weight"] = (H // 2, H)      # schnet.py:199-204
        ks[f"{blk}.attention.0.bias"] = (H // 2,)
        ks[f"{blk}.attention.2.weight"] = (1, H // 2)
        ks[f"{blk}.attention.2.bias"] = (1,)
        se = f"encoder_global.scaling_modules.{i}"         # schnet.py:219-234
        ks[f"{se}.fc.0.weight"] = (H // 16, H)
        ks[f"{se}.fc.2.weight"] = (H, H // 16)
    ks["encoder_local.node_emb.weight"] = (100, H)         # gin.py:90
    for i in range(NL):
        conv = f"encoder_local.convs.{i}"
        ks[f"{conv}.eps"] = (1,)                           # gin.py:36 (buffer)
        ks[f"{conv}.nn.layers.0.weight"] = (H, H)          # common.py:79-80
        ks[f"{conv}.nn.layers.0.bias"] = (H,)
        ks[f"{conv}.nn.layers.1.weight"] = (H, H)
        ks[f"{conv}.nn.layers.1.bias"] = (H,)
        ks.update(_bn_keys(f"encoder_local.batch_norms.{i}", H))  # gin.py:108
    for mlp in ("grad_global_dist_mlp", "grad_local_dist_mlp"):
        dims = [(H, 2 * H), (H // 2, H), (1, H // 2)]      # dualenc.py:88-98
        for m, (o, i) in enumerate(dims):
            ks[f"{mlp}.layers.{m}.weight"] = (o, i)
            ks[f"{mlp}.layers.{m}.bias"] = (o,)
    return ks


def genuine_reference_state_dict(seed=0):
    """A state_dict with EXACTLY the genuine reference key set: the
    torch_reference golden model's tree (whose module names mirror the
    reference) plus every dead parameter a real torch.save contains."""
    torch.manual_seed(seed)
    m = tref.DualEncoderEpsNetwork(hidden_dim=H, num_convs=NC,
                                   num_convs_local=NL)
    sd = {k: v.detach().clone() for k, v in m.state_dict().items()}
    ee = tref.MLPEdgeEncoder(H)
    for k, v in ee.state_dict().items():
        sd[f"edge_encoder_local.{k}"] = v.detach().clone()
    for i in range(NC):
        blk = f"encoder_global.interactions.{i}"
        sd[f"{blk}.conv1.attention.attention_weights"] = torch.randn(H)
        sd[f"{blk}.conv2.attention.attention_weights"] = torch.randn(H // 2)
    for i in range(NL):
        sd[f"encoder_local.convs.{i}.eps"] = torch.zeros(1)
    betas = torch.from_numpy(
        get_beta_schedule("sigmoid", beta_start=1e-7, beta_end=2e-3,
                          num_diffusion_timesteps=T).astype(np.float32))
    sd["betas"] = betas
    sd["alphas"] = torch.cumprod(1.0 - betas, dim=0)
    return sd


# Keys a real checkpoint contains that carry no compute in the reference
# forward; the importer must skip exactly these and nothing else.
def _is_documented_dead(key: str) -> bool:
    return (
        key in ("betas", "alphas")
        or key.startswith("edge_encoder_local.")
        or key.endswith(".attention.attention_weights")
        or key.endswith(".num_batches_tracked")
        or (key.startswith("encoder_local.convs.") and key.endswith(".eps"))
    )


class _RecordingDict(dict):
    def __init__(self, base):
        super().__init__(base)
        self.accessed = set()

    def __getitem__(self, key):
        self.accessed.add(key)
        return super().__getitem__(key)


@pytest.fixture(scope="module")
def genuine():
    return genuine_reference_state_dict(seed=7)


class TestGenuineKeySet:
    def test_inventory_matches_generator(self, genuine):
        """The generated dict has exactly the hand-derived inventory —
        names AND shapes — so the other tests run against the real set."""
        expected = expected_reference_keys()
        assert set(genuine) == set(expected)
        for k, shape in expected.items():
            assert tuple(genuine[k].shape) == shape, k

    def test_importer_accounts_for_every_real_key(self, genuine):
        """Every key of a real checkpoint is either consumed by the importer
        or in the documented dead set — nothing silently dropped."""
        rec = _RecordingDict(genuine)
        cfg = ModelConfig()  # QM9 defaults, tie_edge_encoders=True
        variables = import_reference_state_dict(rec, cfg)
        unaccounted = {
            k for k in genuine
            if k not in rec.accessed and not _is_documented_dead(k)
        }
        assert not unaccounted, sorted(unaccounted)
        # BN running stats landed in batch_stats, not params
        assert "batch_stats" in variables and variables["batch_stats"]

    def test_untied_config_consumes_edge_encoder_local(self, genuine):
        rec = _RecordingDict(genuine)
        import_reference_state_dict(rec, ModelConfig(tie_edge_encoders=False))
        assert any(k.startswith("edge_encoder_local.") for k in rec.accessed)

    def test_forward_parity_from_genuine_state_dict(self, genuine):
        """Two independent paths from the same genuine-layout dict — torch
        strict-ish load vs our importer — must compute the same scores at
        full QM9 size."""
        tmodel = tref.DualEncoderEpsNetwork(hidden_dim=H, num_convs=NC,
                                            num_convs_local=NL)
        missing, unexpected = tmodel.load_state_dict(genuine, strict=False)
        assert not missing, missing
        assert all(_is_documented_dead(k) for k in unexpected), unexpected
        tmodel.eval()

        cfg = ModelConfig()
        variables = import_reference_state_dict(genuine, cfg)
        mol = synthetic_dataset(1, seed=5, min_heavy=5, max_heavy=6)[0]
        batch = pad_molecules([mol], mol.num_nodes, batch_size=1)
        model = get_model(cfg)
        out = model.apply(variables, batch, train=False)

        pos = np.asarray(batch.pos[0])[: mol.num_nodes]
        edge_index, edge_type = working_graph(mol, pos, cfg.cutoff)
        with torch.no_grad():
            g, loc, _, _ = tmodel(
                torch.from_numpy(mol.atom_type.astype(np.int64)),
                torch.from_numpy(pos.astype(np.float32)),
                torch.from_numpy(edge_index), torch.from_numpy(edge_type),
            )
        # full-size untrained activations reach ~1e2; bound relative error
        i, j = edge_index
        np.testing.assert_allclose(
            np.asarray(out.edge_inv_global)[0][i, j], g.numpy()[:, 0],
            rtol=5e-5, atol=3e-4)
        li, lj = edge_index[:, edge_type > 0]
        np.testing.assert_allclose(
            np.asarray(out.edge_inv_local)[0][li, lj], loc.numpy()[:, 0],
            rtol=5e-5, atol=3e-4)

    def test_export_strict_loadable_and_roundtrip_bit_exact(self, genuine):
        """export() must emit the COMPLETE reference key set (the reference
        strict-loads it, scripts/test.py:112); import(export(v)) bit-exact;
        live values survive the genuine->import->export cycle unchanged."""
        cfg = ModelConfig()
        variables = import_reference_state_dict(genuine, cfg)
        exported = export_reference_state_dict(variables, cfg)

        expected = expected_reference_keys()
        assert set(exported) == set(expected)
        for k, shape in expected.items():
            assert tuple(exported[k].shape) == shape, k

        # a reference model strict-loads the export (load_state_dict default)
        tmodel = tref.DualEncoderEpsNetwork(hidden_dim=H, num_convs=NC,
                                            num_convs_local=NL)
        missing, unexpected = tmodel.load_state_dict(exported, strict=False)
        assert not missing, missing
        assert all(_is_documented_dead(k) for k in unexpected), unexpected

        # live keys survive bit-exact
        for k in genuine:
            if _is_documented_dead(k):
                continue
            np.testing.assert_array_equal(
                exported[k].numpy(), genuine[k].numpy(), err_msg=k)
        # schedule buffers are regenerated exactly
        np.testing.assert_array_equal(exported["betas"].numpy(),
                                      genuine["betas"].numpy())
        np.testing.assert_array_equal(exported["alphas"].numpy(),
                                      genuine["alphas"].numpy())

        # import(export(v)) == v bit-exact
        re_imported = import_reference_state_dict(exported, cfg)
        flat_a = jax.tree_util.tree_leaves_with_path(variables)
        flat_b = jax.tree_util.tree_leaves_with_path(re_imported)
        assert len(flat_a) == len(flat_b)
        for (pa, va), (pb, vb) in zip(flat_a, flat_b):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                          err_msg=str(pa))
