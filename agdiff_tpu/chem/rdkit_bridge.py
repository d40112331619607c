"""Optional RDKit interop (host-side, outside the jit boundary).

RDKit is optional in this framework: training/sampling/eval run without it
(the symmetry-aware RMSD kernel is native, chem/rmsd.py + native/rmsd.cpp).
This module provides everything that genuinely needs RDKit: parsing real
molecules, SMILES round-trips, ETKDG embedding, MMFF relaxation, SDF export
(reference call sites: src/agdiff/utils/chem.py, datasets.py:326-380,
smiles_generation.py:253-284, covmat.py:26-28).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from agdiff_tpu.chem.mol import Molecule

try:
    from rdkit import Chem
    from rdkit.Chem import AllChem
    from rdkit.Chem.rdchem import BondType as BT

    HAS_RDKIT = True
except ImportError:  # pragma: no cover - environment without RDKit
    Chem = None
    HAS_RDKIT = False


def _require_rdkit():
    if not HAS_RDKIT:
        raise ImportError(
            "RDKit is required for this operation; install the 'rdkit' extra. "
            "Training, sampling and RMSD evaluation work without it."
        )


def rdmol_to_molecule(mol, smiles: Optional[str] = None) -> Molecule:
    """RDKit Mol (with one conformer) -> Molecule. Mirrors the reference
    rdmol_to_data (datasets.py:326-380): directed duplicated bonds sorted in
    row-major order, H kept, bond types via the RDKit BondType enum index."""
    _require_rdkit()
    assert mol.GetNumConformers() == 1
    n = mol.GetNumAtoms()
    pos = np.asarray(mol.GetConformer(0).GetPositions(), np.float32)
    z = np.array([a.GetAtomicNum() for a in mol.GetAtoms()], np.int32)

    row, col, etype = [], [], []
    for bond in mol.GetBonds():
        start, end = bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()
        t = int(bond.GetBondType())
        row += [start, end]
        col += [end, start]
        etype += [t, t]
    order = np.argsort(np.array(row) * n + np.array(col))
    if smiles is None:
        smiles = Chem.MolToSmiles(mol)
    return Molecule(
        atom_type=z,
        pos=pos,
        bond_index=np.stack([np.array(row)[order], np.array(col)[order]]),
        bond_type=np.array(etype, np.int32)[order],
        smiles=smiles,
    )


def molecule_to_rdmol(mol: Molecule, pos: Optional[np.ndarray] = None):
    """Molecule -> RDKit Mol with one conformer (for SDF export / MMFF)."""
    _require_rdkit()
    rw = Chem.RWMol()
    for z in mol.atom_type:
        rw.AddAtom(Chem.Atom(int(z)))
    pairs, types = mol.undirected_bonds()
    for (i, j), t in zip(pairs, types):
        rw.AddBond(int(i), int(j), BT.values[int(t)])
    m = rw.GetMol()
    conf = Chem.Conformer(mol.num_nodes)
    p = mol.pos if pos is None else np.asarray(pos)
    for i in range(mol.num_nodes):
        conf.SetAtomPosition(i, [float(x) for x in p[i]])
    m.AddConformer(conf)
    try:
        Chem.SanitizeMol(m)
    except Exception:
        pass  # geometry export does not require valid valence
    return m


def smiles_to_molecule(smiles: str, seed: int = 2021) -> Molecule:
    """SMILES -> AddHs -> ETKDGv3 embedding -> Molecule (reference:
    smiles_generation.py:253-284)."""
    _require_rdkit()
    m = Chem.MolFromSmiles(smiles)
    if m is None:
        raise ValueError(f"cannot parse SMILES: {smiles}")
    m = Chem.AddHs(m)
    params = AllChem.ETKDGv3()
    params.randomSeed = seed
    if AllChem.EmbedMolecule(m, params) != 0:
        # fall back to random coordinates (reference raises)
        AllChem.EmbedMolecule(m, useRandomCoords=True, randomSeed=seed)
    return rdmol_to_molecule(m, smiles=smiles)


def mmff_optimize_positions(mol: Molecule, pos: np.ndarray) -> np.ndarray:
    """MMFF94 relaxation of a conformation (reference covmat.py:26-28
    useFF path)."""
    _require_rdkit()
    from rdkit.Chem.rdForceFieldHelpers import MMFFOptimizeMolecule

    m = molecule_to_rdmol(mol, pos)
    try:
        MMFFOptimizeMolecule(m)
        return np.asarray(m.GetConformer(0).GetPositions(), np.float32)
    except Exception:
        return np.asarray(pos, np.float32)


def rdkit_best_rmsd(ref_mol, gen_mol) -> float:
    """RDKit GetBestRMS on H-stripped copies (the reference metric,
    chem.py:133-137) — used to cross-validate the native kernel."""
    _require_rdkit()
    from rdkit.Chem import rdMolAlign
    from rdkit.Chem.rdmolops import RemoveHs

    return float(rdMolAlign.GetBestRMS(RemoveHs(gen_mol), RemoveHs(ref_mol)))


def write_sdf(path: str, mol: Molecule, conformers: np.ndarray) -> None:
    """Write generated conformers to an SDF file (reference:
    smiles_generation.py:409-445)."""
    _require_rdkit()
    writer = Chem.SDWriter(path)
    for pos in np.asarray(conformers).reshape(-1, mol.num_nodes, 3):
        writer.write(molecule_to_rdmol(mol, pos))
    writer.close()


def mol_to_smiles(rdmol) -> str:
    """Canonical SMILES (reference chem.py:74-75)."""
    _require_rdkit()
    return Chem.MolToSmiles(Chem.RemoveHs(rdmol))


def smiles_to_canonical(smiles: str) -> str:
    _require_rdkit()
    return Chem.CanonSmiles(smiles)


def draw_mol_image(rdmol, tensor: bool = False):
    """2D depiction (reference chem.py:27-33); returns a PIL image, or an
    (C, H, W) float numpy array if tensor=True (torchvision-free)."""
    _require_rdkit()
    from rdkit.Chem import Draw

    rdmol.UpdatePropertyCache()
    img = Draw.MolToImage(rdmol, kekulize=False)
    if tensor:
        arr = np.asarray(img, np.float32) / 255.0
        return arr.transpose(2, 0, 1)
    return img
