"""Reference-pickle interop: load PyG-style dataset pickles without
torch_geometric installed (agdiff_tpu/data/geom.py shim unpickler)."""

import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from agdiff_tpu.data.geom import load_reference_pickle


def _fake_pyg_class(module, name):
    """Create a class that pickles under a torch_geometric module path by
    installing a stub module into sys.modules (pickle verifies importability
    when writing; reading goes through the shim unpickler)."""
    import sys
    import types

    parts = module.split(".")
    for k in range(1, len(parts) + 1):
        mod_name = ".".join(parts[:k])
        if mod_name not in sys.modules:
            sys.modules[mod_name] = types.ModuleType(mod_name)
    existing = getattr(sys.modules[module], name, None)
    if existing is not None:
        return existing
    cls = type(name, (), {})
    cls.__module__ = module
    cls.__qualname__ = name
    setattr(sys.modules[module], name, cls)
    return cls


def _make_legacy_data(n=4):
    """PyG 1.x layout: attributes directly on Data.__dict__."""
    Data = _fake_pyg_class("torch_geometric.data.data", "Data")
    d = Data()
    d.atom_type = torch.tensor([6, 1, 1, 8])
    d.pos = torch.randn(n, 3)
    d.edge_index = torch.tensor([[0, 1, 0, 2, 0, 3], [1, 0, 2, 0, 3, 0]])
    d.edge_type = torch.tensor([1, 1, 1, 1, 2, 2])
    d.smiles = "CO"
    d.idx = torch.tensor([3])
    d.boltzmannweight = torch.tensor([0.25])
    return d


def _make_pyg2_data(n=3):
    """PyG 2.x layout: attributes inside _store._mapping."""
    Data = _fake_pyg_class("torch_geometric.data.data", "Data")
    Storage = _fake_pyg_class("torch_geometric.data.storage", "GlobalStorage")
    store = Storage()
    store._mapping = {
        "atom_type": torch.tensor([6, 6, 8]),
        "pos": torch.randn(n, 3),
        "edge_index": torch.tensor([[0, 1, 1, 2], [1, 0, 2, 1]]),
        "edge_type": torch.tensor([1, 1, 1, 1]),
        "smiles": "CCO-frag",
    }
    d = Data()
    d._store = store
    return d


class TestReferencePickleInterop:
    def test_legacy_layout(self, tmp_path):
        objs = [_make_legacy_data() for _ in range(3)]
        path = str(tmp_path / "legacy.pkl")
        with open(path, "wb") as f:
            pickle.dump(objs, f)
        mols = load_reference_pickle(path)
        assert len(mols) == 3
        m = mols[0]
        np.testing.assert_array_equal(m.atom_type, [6, 1, 1, 8])
        assert m.bond_index.shape == (2, 6)
        assert m.smiles == "CO"
        assert m.meta["idx"] == 3
        assert m.meta["boltzmannweight"] == pytest.approx(0.25)

    def test_pyg2_store_layout(self, tmp_path):
        objs = [_make_pyg2_data()]
        path = str(tmp_path / "pyg2.pkl")
        with open(path, "wb") as f:
            pickle.dump(objs, f)
        mols = load_reference_pickle(path)
        assert len(mols) == 1
        assert mols[0].num_nodes == 3
        assert mols[0].smiles == "CCO-frag"

    def test_dataset_loads_reference_pkl(self, tmp_path):
        from agdiff_tpu.data.dataset import ConformationDataset

        path = str(tmp_path / "ds.pkl")
        with open(path, "wb") as f:
            pickle.dump([_make_legacy_data() for _ in range(2)], f)
        ds = ConformationDataset(path)
        assert len(ds) == 2
        assert 6 in ds.atom_types
