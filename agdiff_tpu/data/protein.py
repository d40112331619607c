"""Protein-scale machinery: sidechain subgraph sampling and subgraph-
decomposed inference.

The reference ships this machinery in a dead/broken state (SURVEY.md 2.6):
`SidechainConformationDataset` (datasets.py:863-936) depends on PDB
annotations produced by functions with commented-out imports, and
`accumulate_grad_from_subgraph` (datasets.py:939-1017) has typos and no
return. The equivalents here are WORKING implementations of the same ideas:

  * sample_sidechain_subgraph — pick a backbone atom, take the atoms within
    a cutoff ball, complete every touched residue, reindex into a standalone
    Molecule (the reference's sampling rule, datasets.py:883-921);
  * SidechainConformationDataset — dataset of such subgraphs over one or
    more annotated structures;
  * subgraph_position_scores — evaluate the score network on overlapping
    spatial subgraphs of a large structure and average the per-node position
    scores back into the full structure (the working version of the
    reference's subgraph gradient accumulation).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from agdiff_tpu.chem.mol import Molecule


def sample_sidechain_subgraph(
    mol: Molecule,
    annotations: Dict[str, np.ndarray],
    center_idx: Optional[int] = None,
    cutoff: float = 10.0,
    rng: Optional[np.random.Generator] = None,
) -> Optional[Molecule]:
    """Cut a residue-complete spatial subgraph around a backbone atom.

    Returns None if the selection is degenerate (mirrors the reference's
    None-dropping collate, datasets.py:924-936).
    """
    rng = rng or np.random.default_rng()
    is_backbone = annotations["is_backbone"]
    res_id = annotations["res_id"]
    backbone_idx = np.nonzero(is_backbone)[0]
    if backbone_idx.size == 0:
        return None
    if center_idx is None:
        center_idx = int(rng.choice(backbone_idx))
    center = mol.pos[center_idx]
    within = np.linalg.norm(mol.pos - center, axis=-1) <= cutoff
    touched_residues = np.unique(res_id[within])
    keep = np.isin(res_id, touched_residues)
    if keep.sum() < 4:
        return None

    new_index = -np.ones(mol.num_nodes, np.int64)
    new_index[keep] = np.arange(int(keep.sum()))
    i, j = mol.bond_index
    bond_keep = keep[i] & keep[j]
    sub = Molecule(
        atom_type=mol.atom_type[keep],
        pos=mol.pos[keep],
        bond_index=np.stack([new_index[i[bond_keep]], new_index[j[bond_keep]]]),
        bond_type=mol.bond_type[bond_keep],
        smiles=mol.smiles,
        meta={
            "parent_index": np.nonzero(keep)[0].astype(np.int32),
            "center_idx": int(new_index[center_idx]),
            "is_sidechain": annotations["is_sidechain"][keep],
            "is_backbone": is_backbone[keep],
            "res_id": res_id[keep],
        },
    )
    return sub


class SidechainConformationDataset:
    """Random sidechain subgraphs over annotated structures — one sampled
    subgraph per __getitem__ (the reference's training-time sampler)."""

    def __init__(self, structures: Sequence, cutoff: float = 10.0,
                 seed: int = 0):
        # structures: list of (Molecule, annotations) as from chem.pdb
        self.structures = list(structures)
        self.cutoff = cutoff
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.structures)

    def __getitem__(self, idx: int) -> Optional[Molecule]:
        mol, ann = self.structures[idx % len(self.structures)]
        return sample_sidechain_subgraph(
            mol, ann, cutoff=self.cutoff, rng=self.rng
        )

    @staticmethod
    def collate(items: List[Optional[Molecule]]) -> List[Molecule]:
        """Drop failed samples (reference's None-filtering collate_fn)."""
        return [m for m in items if m is not None]


def subgraph_position_scores(
    mol: Molecule,
    annotations: Dict[str, np.ndarray],
    score_fn,
    max_nodes: int,
    cutoff: float = 10.0,
    edge_order: int = 3,
) -> np.ndarray:
    """Score a structure too large for one bucket by decomposition.

    Covers every backbone atom with a residue-complete subgraph, evaluates
    `score_fn(GraphBatch) -> (B, N, 3) position scores` on each, and averages
    overlapping contributions back onto the full structure. This is the
    working equivalent of the reference's accumulate_grad_from_subgraph
    (datasets.py:939-1017, which is unreachable/broken there).
    """
    from agdiff_tpu.data.bucketing import pad_molecules

    n = mol.num_nodes
    total = np.zeros((n, 3), np.float64)
    counts = np.zeros((n,), np.float64)
    covered = np.zeros((n,), bool)
    backbone_idx = list(np.nonzero(annotations["is_backbone"])[0])
    rng = np.random.default_rng(0)
    for center in backbone_idx:
        if covered.all():
            break
        sub = sample_sidechain_subgraph(
            mol, annotations, center_idx=int(center), cutoff=cutoff, rng=rng
        )
        if sub is None or sub.num_nodes > max_nodes:
            continue
        parent = sub.meta["parent_index"]
        if covered[parent].all():
            continue
        batch = pad_molecules([sub], max_nodes, edge_order, batch_size=1)
        scores = np.asarray(score_fn(batch))[0, : sub.num_nodes]
        total[parent] += scores
        counts[parent] += 1.0
        covered[parent] = True
    out = total / np.maximum(counts, 1.0)[:, None]
    return out.astype(np.float32)
