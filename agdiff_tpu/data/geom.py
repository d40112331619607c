"""GEOM dataset preprocessing and reference-pickle interop.

Mirrors the reference pipelines (src/agdiff/utils/datasets.py):
  * preprocess_geom_fixed_num_conf — exactly conf_per_mol Boltzmann-top
    conformers per molecule, tot_mol_size molecules, shuffled train/val/test
    split by molecule index, totalenergy/boltzmannweight/idx labels
    (reference: datasets.py:559-710);
  * preprocess_geom — top max_conf conformers per molecule, random split
    (reference: datasets.py:441-556);
  * get_test_set_with_large_num_conf — molecules with [min_conf, max_conf]
    conformers excluding train/val smiles (reference: datasets.py:713-825);
  * load_reference_pickle — read the reference's .pkl datasets (lists of PyG
    Data objects) WITHOUT torch_geometric installed, via an unpickling shim.

All functions emit lists of agdiff_tpu.chem.mol.Molecule; RDKit is required
only for reading raw GEOM pickles (the rd_mol objects inside).
"""

from __future__ import annotations

import json
import os
import pickle
import random
from typing import Dict, List, Optional, Tuple

import numpy as np

from agdiff_tpu.chem.mol import Molecule


# --------------------------------------------------------------------------
# Reference-pickle interop (lists of PyG Data) without torch_geometric
# --------------------------------------------------------------------------

class _DataShim:
    """Stand-in for torch_geometric.data.Data during unpickling."""

    def __init__(self, *args, **kwargs):
        self.__dict__.update(kwargs)

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state


class _ShimUnpickler(pickle.Unpickler):
    _SHIMMED_PREFIXES = ("torch_geometric",)

    def find_class(self, module, name):
        if any(module.startswith(p) for p in self._SHIMMED_PREFIXES):
            return _DataShim
        return super().find_class(module, name)


def _unshim_value(v):
    try:
        import torch

        if isinstance(v, torch.Tensor):
            return v.numpy()
    except ImportError:
        pass
    return v


def _shim_to_molecule(obj) -> Molecule:
    d = obj.__dict__ if hasattr(obj, "__dict__") else dict(obj)
    # PyG>=2 stores attributes under _store
    for key in ("_store", "_mapping"):
        if key in d and hasattr(d[key], "__dict__"):
            inner = d[key].__dict__
            d = {**d, **inner.get("_mapping", inner)}
    flat = {}
    for k, v in d.items():
        if isinstance(v, dict):
            flat.update(v)
        else:
            flat[k] = v
    get = lambda *names: next(
        (_unshim_value(flat[n]) for n in names if n in flat), None
    )
    atom_type = get("atom_type", "z")
    pos = get("pos")
    edge_index = get("edge_index")
    edge_type = get("edge_type")
    if atom_type is None or pos is None or edge_index is None:
        raise ValueError(f"unrecognized Data layout: keys={sorted(flat)}")
    meta = {}
    for label in ("totalenergy", "boltzmannweight", "idx"):
        v = get(label)
        if v is not None:
            meta[label] = float(np.asarray(v).reshape(-1)[0])
    pos_ref = get("pos_ref")
    mol = Molecule(
        atom_type=np.asarray(atom_type),
        pos=np.asarray(pos, np.float32),
        bond_index=np.asarray(edge_index),
        bond_type=np.asarray(
            edge_type if edge_type is not None
            else np.ones(np.asarray(edge_index).shape[1])
        ),
        pos_ref=None if pos_ref is None else np.asarray(pos_ref, np.float32),
        smiles=flat.get("smiles"),
        meta=meta,
    )
    return mol


def load_reference_pickle(path: str) -> List[Molecule]:
    """Load a reference-format dataset pickle (list of PyG Data)."""
    with open(path, "rb") as f:
        data_list = _ShimUnpickler(f).load()
    return [_shim_to_molecule(d) for d in data_list]


# --------------------------------------------------------------------------
# GEOM raw preprocessing (requires RDKit for rd_mol objects)
# --------------------------------------------------------------------------

def _read_summary(base_path: str, dataset_name: str) -> Dict:
    assert dataset_name in ("qm9", "drugs")
    with open(os.path.join(base_path, f"summary_{dataset_name}.json")) as f:
        return json.load(f)


def _mol_pickle_to_conformers(
    base_path: str, pickle_path: str
) -> Optional[dict]:
    with open(os.path.join(base_path, pickle_path), "rb") as f:
        return pickle.load(f)


def preprocess_geom_fixed_num_conf(
    base_path: str,
    dataset_name: str,
    conf_per_mol: int = 5,
    train_size: float = 0.8,
    tot_mol_size: int = 50000,
    seed: Optional[int] = None,
) -> Tuple[List[Molecule], List[Molecule], List[Molecule], Dict[int, str]]:
    """Reference datasets.py:559-710 semantics (same RNG usage pattern)."""
    from agdiff_tpu.chem.rdkit_bridge import rdmol_to_molecule

    if seed is None:
        seed = 2021
    np.random.seed(seed)
    random.seed(seed)

    summ = _read_summary(base_path, dataset_name)
    pickle_path_list = []
    for smiles, meta_mol in summ.items():
        u_conf = meta_mol.get("uniqueconfs")
        pkl = meta_mol.get("pickle_path")
        if u_conf is None or pkl is None or u_conf < conf_per_mol:
            continue
        pickle_path_list.append(pkl)
    random.shuffle(pickle_path_list)
    assert len(pickle_path_list) >= tot_mol_size, (
        f"only {len(pickle_path_list)} molecules available "
        f"(< tot_mol_size {tot_mol_size})"
    )
    pickle_path_list = pickle_path_list[:tot_mol_size]

    split_indexes = list(range(tot_mol_size))
    random.shuffle(split_indexes)
    val_size = (1.0 - train_size) / 2
    index2split: Dict[int, str] = {}
    n_train = int(tot_mol_size * train_size)
    n_val = int(tot_mol_size * (train_size + val_size))
    for i in range(0, n_train):
        index2split[split_indexes[i]] = "train"
    for i in range(n_train, n_val):
        index2split[split_indexes[i]] = "val"
    for i in range(n_val, tot_mol_size):
        index2split[split_indexes[i]] = "test"

    splits = {"train": [], "val": [], "test": []}
    bad_case = 0
    for i, pkl in enumerate(pickle_path_list):
        mol = _mol_pickle_to_conformers(base_path, pkl)
        if mol.get("uniqueconfs") > len(mol.get("conformers")) or \
                mol.get("uniqueconfs") <= 0:
            bad_case += 1
            continue
        smiles = mol.get("smiles")
        if mol.get("uniqueconfs") == conf_per_mol:
            conf_ids = np.arange(mol.get("uniqueconfs"))
        else:
            weights = np.array(
                [c.get("boltzmannweight", -1.0) for c in mol.get("conformers")]
            )
            conf_ids = (-weights).argsort()[:conf_per_mol]
        for cid in conf_ids:
            conf_meta = mol.get("conformers")[cid]
            m = rdmol_to_molecule(conf_meta.get("rd_mol"), smiles=smiles)
            m.meta = {
                "totalenergy": float(conf_meta["totalenergy"]),
                "boltzmannweight": float(conf_meta["boltzmannweight"]),
                "idx": int(i),
            }
            splits[index2split[i]].append(m)
    return splits["train"], splits["val"], splits["test"], index2split


def preprocess_geom(
    base_path: str,
    dataset_name: str,
    max_conf: int = 5,
    train_size: float = 0.8,
    max_size: int = 9999999999,
    seed: Optional[int] = None,
) -> List[Molecule]:
    """Reference datasets.py:441-556: top-max_conf Boltzmann conformers per
    molecule, random 80/10/10 split stored in meta['split']."""
    from agdiff_tpu.chem.rdkit_bridge import rdmol_to_molecule

    if seed is None:
        seed = 2021
    np.random.seed(seed)
    random.seed(seed)

    summ = _read_summary(base_path, dataset_name)
    items = [
        (s, m["pickle_path"]) for s, m in summ.items()
        if m.get("uniqueconfs") is not None and m.get("pickle_path")
    ]
    random.shuffle(items)
    all_mols: List[Molecule] = []
    for smiles, pkl in items[:max_size]:
        try:
            mol = _mol_pickle_to_conformers(base_path, pkl)
        except FileNotFoundError:
            continue
        confs = mol.get("conformers", [])
        if not confs:
            continue
        weights = np.array([c.get("boltzmannweight", -1.0) for c in confs])
        conf_ids = (-weights).argsort()[:max_conf]
        split = np.random.choice(
            ["train", "val", "test"], p=[train_size, (1 - train_size) / 2,
                                         (1 - train_size) / 2]
        )
        for cid in conf_ids:
            m = rdmol_to_molecule(confs[cid].get("rd_mol"),
                                  smiles=mol.get("smiles"))
            m.meta = {"split": str(split)}
            all_mols.append(m)
    return all_mols


def get_test_set_with_large_num_conf(
    base_path: str,
    dataset_name: str,
    block: Optional[List[str]] = None,
    tot_mol_size: int = 1000,
    min_conf: int = 50,
    max_conf: int = 500,
    seed: Optional[int] = None,
) -> List[Molecule]:
    """Reference datasets.py:713-825: the packed test set — molecules with
    min_conf..max_conf conformers, excluding block-listed smiles; ALL
    conformers of each selected molecule are packed into pos_ref."""
    from agdiff_tpu.chem.rdkit_bridge import rdmol_to_molecule

    if seed is None:
        seed = 2021
    np.random.seed(seed)
    random.seed(seed)
    block = set(block or [])

    summ = _read_summary(base_path, dataset_name)
    candidates = []
    for smiles, meta_mol in summ.items():
        u_conf = meta_mol.get("uniqueconfs")
        pkl = meta_mol.get("pickle_path")
        if u_conf is None or pkl is None:
            continue
        if u_conf < min_conf or u_conf > max_conf or smiles in block:
            continue
        candidates.append(pkl)
    random.shuffle(candidates)

    packed: List[Molecule] = []
    for i, pkl in enumerate(candidates):
        if len(packed) >= tot_mol_size:
            break
        mol = _mol_pickle_to_conformers(base_path, pkl)
        confs = mol.get("conformers", [])
        if not confs:
            continue
        base = rdmol_to_molecule(confs[0].get("rd_mol"),
                                 smiles=mol.get("smiles"))
        pos_ref = np.concatenate(
            [np.asarray(c["rd_mol"].GetConformer(0).GetPositions(),
                        np.float32) for c in confs],
            axis=0,
        )
        base.pos_ref = pos_ref
        base.meta = {"idx": int(i), "num_confs": len(confs)}
        packed.append(base)
    return packed


def preprocess_iso17(base_path: str) -> Tuple[List[Molecule], List[Molecule]]:
    """ISO17 preprocessing (reference datasets.py:402-438): reads the
    iso17_split-0_{train,test}.pkl dicts of rdkit mols + positions and emits
    Molecule lists. Requires RDKit for the embedded rd_mol objects."""
    from agdiff_tpu.chem.rdkit_bridge import rdmol_to_molecule

    out = []
    for split in ("train", "test"):
        path = os.path.join(base_path, f"iso17_split-0_{split}.pkl")
        with open(path, "rb") as f:
            raw = pickle.load(f)
        mols = [rdmol_to_molecule(m) for m in raw]
        out.append(mols)
    return tuple(out)
