"""Reference-checkpoint import: torch state_dict -> flax variables.

Round-trip check: flax init -> weight transplant into the pure-torch golden
model (tests/torch_reference.py, whose module names mirror the reference's)
-> state_dict() -> import_reference_state_dict -> must equal the original
flax trees bit-for-bit; and the imported model must produce identical
forward outputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from agdiff_tpu.config import ModelConfig
from agdiff_tpu.data.bucketing import pad_molecules
from agdiff_tpu.data.synthetic import synthetic_dataset
from agdiff_tpu.models.dualenc import get_model
from agdiff_tpu.train.import_torch import import_reference_state_dict

from test_torch_parity import transplant


@pytest.fixture(scope="module")
def roundtrip():
    cfg = ModelConfig(hidden_dim=32, num_convs=2, num_convs_local=2,
                      num_diffusion_timesteps=50)
    mol = synthetic_dataset(1, seed=31, min_heavy=4, max_heavy=4)[0]
    batch = pad_molecules([mol], mol.num_nodes, batch_size=1)
    model = get_model(cfg)
    variables = model.init(jax.random.PRNGKey(7), batch, train=False)
    tmodel = transplant(variables, cfg)
    imported = import_reference_state_dict(tmodel.state_dict(), cfg)
    return cfg, batch, model, variables, imported


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a.keys()) == set(b.keys()), (
            f"{path}: {sorted(a)} != {sorted(b)}"
        )
        for k in a:
            _tree_equal(a[k], b[k], path + "/" + str(k))
    else:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, err_msg=path
        )


class TestImport:
    def test_params_roundtrip_exactly(self, roundtrip):
        _, _, _, variables, imported = roundtrip
        _tree_equal(
            jax.tree_util.tree_map(np.asarray, variables["params"]),
            imported["params"],
        )
        _tree_equal(
            jax.tree_util.tree_map(np.asarray, variables["batch_stats"]),
            imported["batch_stats"],
        )

    def test_forward_with_imported_weights(self, roundtrip):
        cfg, batch, model, variables, imported = roundtrip
        out0 = model.apply(variables, batch, train=False)
        out1 = model.apply(
            {"params": imported["params"],
             "batch_stats": imported["batch_stats"]},
            batch, train=False,
        )
        np.testing.assert_allclose(
            np.asarray(out0.edge_inv_global),
            np.asarray(out1.edge_inv_global), atol=1e-6,
        )
