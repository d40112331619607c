"""Minimal native PDB reader (no mdtraj/RDKit).

Covers what the reference uses PDB input for (examples/
test_alanine_dipeptide.py and the protein machinery in datasets.py:218-323):
ATOM/HETATM parsing with residue annotations, CONECT bonds, and
covalent-radius bond perception when CONECT records are absent.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from agdiff_tpu.chem.constants import ATOMIC_NUMBERS, BondType
from agdiff_tpu.chem.mol import Molecule

# single-bond covalent radii (Angstrom), Pyykko & Atsumi values (rounded)
_COVALENT_RADIUS = {
    1: 0.32, 5: 0.85, 6: 0.75, 7: 0.71, 8: 0.63, 9: 0.64, 14: 1.16,
    15: 1.11, 16: 1.03, 17: 0.99, 35: 1.14, 53: 1.33,
}


def _element_of(line: str) -> Optional[int]:
    elem = line[76:78].strip() if len(line) >= 78 else ""
    if not elem:
        # fall back to atom-name heuristics (columns 12-16)
        name = line[12:16].strip()
        elem = name[:2].capitalize() if name[:2].capitalize() in ATOMIC_NUMBERS \
            else name[:1].upper()
    elem = elem.capitalize()
    return ATOMIC_NUMBERS.get(elem)


def parse_pdb(text: str) -> Tuple[Molecule, Dict[str, np.ndarray]]:
    """Parse PDB text -> (Molecule, annotations).

    Annotations (per atom): atom_name, res_name, res_id, is_backbone,
    is_sidechain, is_alpha — the fields the reference's pdb_to_data attaches
    (datasets.py:218-323).
    """
    serials: Dict[int, int] = {}
    atom_type: List[int] = []
    pos: List[List[float]] = []
    names, res_names, res_ids = [], [], []
    conect: List[Tuple[int, int]] = []
    for line in text.splitlines():
        rec = line[:6].strip()
        if rec in ("ATOM", "HETATM"):
            z = _element_of(line)
            if z is None:
                continue
            serial = int(line[6:11])
            serials[serial] = len(atom_type)
            atom_type.append(z)
            pos.append([float(line[30:38]), float(line[38:46]),
                        float(line[46:54])])
            names.append(line[12:16].strip())
            res_names.append(line[17:20].strip())
            res_ids.append(int(line[22:26]))
        elif rec == "CONECT":
            fields = [int(line[k:k + 5]) for k in range(6, min(len(line), 31), 5)
                      if line[k:k + 5].strip()]
            for other in fields[1:]:
                conect.append((fields[0], other))

    n = len(atom_type)
    atom_type_arr = np.array(atom_type, np.int32)
    pos_arr = np.array(pos, np.float32)

    bonds = set()
    for a, b in conect:
        if a in serials and b in serials:
            i, j = serials[a], serials[b]
            if i != j:
                bonds.add((min(i, j), max(i, j)))
    if not bonds:
        bonds = perceive_bonds(atom_type_arr, pos_arr)

    src, dst = [], []
    for i, j in sorted(bonds):
        src += [i, j]
        dst += [j, i]
    order = np.argsort(np.array(src) * n + np.array(dst)) if src else []
    backbone_names = {"N", "CA", "C", "O"}
    annotations = {
        "atom_name": np.array(names),
        "res_name": np.array(res_names),
        "res_id": np.array(res_ids, np.int32),
        "is_backbone": np.array([nm in backbone_names for nm in names]),
        "is_sidechain": np.array(
            [nm not in backbone_names and z != 1
             for nm, z in zip(names, atom_type)]
        ),
        "is_alpha": np.array([nm == "CA" for nm in names]),
    }
    mol = Molecule(
        atom_type=atom_type_arr,
        pos=pos_arr,
        bond_index=np.stack([np.array(src)[order], np.array(dst)[order]])
        if src else np.zeros((2, 0), np.int32),
        bond_type=np.full(len(src), int(BondType.SINGLE), np.int32)[order]
        if src else np.zeros((0,), np.int32),
    )
    return mol, annotations


def perceive_bonds(atom_type: np.ndarray, pos: np.ndarray,
                   tolerance: float = 0.45) -> set:
    """Distance-based bond perception: bond if d < r_i + r_j + tolerance."""
    n = len(atom_type)
    bonds = set()
    dist = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    radii = np.array([_COVALENT_RADIUS.get(int(z), 0.8) for z in atom_type])
    thresh = radii[:, None] + radii[None, :] + tolerance
    ii, jj = np.nonzero((dist < thresh) & (dist > 0.4))
    for i, j in zip(ii, jj):
        if i < j:
            bonds.add((int(i), int(j)))
    return bonds


def load_pdb(path: str) -> Tuple[Molecule, Dict[str, np.ndarray]]:
    with open(path) as f:
        return parse_pdb(f.read())


def write_pdb(path: str, mol: Molecule, conformers: np.ndarray,
              annotations: Optional[Dict[str, np.ndarray]] = None) -> None:
    """Write one or more conformations as a (multi-MODEL) PDB file — the
    dependency-free replacement for the reference's mdtraj DCD export
    (examples/test_alanine_dipeptide.py:106-135)."""
    from agdiff_tpu.chem.constants import ATOM_SYMBOLS

    confs = np.asarray(conformers, np.float32).reshape(-1, mol.num_nodes, 3)
    names = annotations["atom_name"] if annotations else None
    res_names = annotations["res_name"] if annotations else None
    res_ids = annotations["res_id"] if annotations else None
    with open(path, "w") as f:
        for m, pos in enumerate(confs, start=1):
            if len(confs) > 1:
                f.write(f"MODEL     {m:4d}\n")
            for i in range(mol.num_nodes):
                sym = ATOM_SYMBOLS.get(int(mol.atom_type[i]), "X")
                name = names[i] if names is not None else sym
                rn = res_names[i] if res_names is not None else "UNK"
                ri = int(res_ids[i]) if res_ids is not None else 1
                f.write(
                    "ATOM  %5d %-4s %-3s A%4d    %8.3f%8.3f%8.3f  1.00  0.00"
                    "          %2s\n"
                    % (i + 1, name[:4], rn[:3], ri, pos[i, 0], pos[i, 1],
                       pos[i, 2], sym)
                )
            if len(confs) > 1:
                f.write("ENDMDL\n")
        f.write("END\n")
