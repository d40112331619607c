"""Datasets and host-side batching.

Mirrors the reference's two dataset flavours:
  * ConformationDataset — one entry per conformer, used for training
    (reference: src/agdiff/utils/datasets.py:828-860).
  * PackedConformationDataset — one entry per molecule with all reference
    conformers stacked into pos_ref, used at generation/eval time
    (reference: src/agdiff/utils/datasets.py:1020-1071).

Both load either the native .npz molecule format (chem.mol.save_molecules) or,
when RDKit+torch pickles are available, the reference's pickle format via
agdiff_tpu.data.geom. The train loader performs bucketed padding + collation
on the host; a background thread can prefetch so host collation overlaps with
device compute (the reference uses DataLoader(num_workers=1), train.py:83).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from agdiff_tpu.chem.mol import Molecule, load_molecules
from agdiff_tpu.data.bucketing import group_by_bucket, pad_molecules
from agdiff_tpu.data.graph_batch import GraphBatch


def _load_any(path: str) -> List[Molecule]:
    if path.endswith(".npz"):
        return load_molecules(path)
    if path.endswith(".pkl"):
        from agdiff_tpu.data.geom import load_reference_pickle

        return load_reference_pickle(path)
    raise ValueError(f"Unknown dataset format: {path}")


class ConformationDataset:
    """One entry per conformer."""

    def __init__(self, source, transform=None):
        if isinstance(source, str):
            self.molecules = _load_any(source)
        else:
            self.molecules = list(source)
        self.transform = transform
        # vocab collection, as in reference datasets.py:848-860
        self.atom_types = sorted(
            {int(a) for m in self.molecules for a in np.unique(m.atom_type)}
        )
        self.edge_types = sorted(
            {int(t) for m in self.molecules for t in np.unique(m.bond_type)}
        )

    def __len__(self) -> int:
        return len(self.molecules)

    def __getitem__(self, idx: int) -> Molecule:
        mol = self.molecules[idx]
        if self.transform is not None:
            mol = self.transform(mol)
        return mol

    def max_num_nodes(self) -> int:
        return max(m.num_nodes for m in self.molecules)


class PackedConformationDataset(ConformationDataset):
    """One entry per molecule; pos_ref holds the stacked reference conformers.

    If given per-conformer molecules, packs them by smiles/idx the way the
    reference packs (datasets.py:1043-1061)."""

    def __init__(self, source, transform=None):
        super().__init__(source, transform)
        if self.molecules and self.molecules[0].pos_ref is None:
            self.molecules = _pack(self.molecules)

    def num_refs(self, idx: int) -> int:
        return self.molecules[idx].num_ref


def _pack(mols: List[Molecule]) -> List[Molecule]:
    by_key: Dict[str, List[Molecule]] = {}
    order: List[str] = []
    for m in mols:
        key = m.smiles or str(m.meta.get("idx", id(m)))
        if key not in by_key:
            by_key[key] = []
            order.append(key)
        by_key[key].append(m)
    packed = []
    for key in order:
        group = by_key[key]
        first = group[0]
        packed.append(
            Molecule(
                atom_type=first.atom_type,
                pos=first.pos,
                bond_index=first.bond_index,
                bond_type=first.bond_type,
                pos_ref=np.concatenate([g.pos for g in group], axis=0),
                smiles=first.smiles,
                meta=dict(first.meta),
            )
        )
    return packed


class BucketedLoader:
    """Infinite shuffled loader yielding (bucket_size, GraphBatch).

    Each draw picks a bucket with probability proportional to its population,
    then samples batch_size molecules (with replacement across epochs) from
    that bucket, so every batch has a single static shape.
    """

    def __init__(
        self,
        dataset: ConformationDataset,
        batch_size: int,
        buckets: Sequence[int] = (32, 64),
        edge_order: int = 3,
        seed: int = 0,
        shuffle: bool = True,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.edge_order = edge_order
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.groups = group_by_bucket(dataset.molecules, buckets)
        self.bucket_sizes = sorted(self.groups)
        pops = np.array([len(self.groups[b]) for b in self.bucket_sizes], float)
        self.bucket_probs = pops / pops.sum()
        # per-bucket shuffled cursors (epoch-style, no replacement within epoch)
        self._perm = {b: self.rng.permutation(self.groups[b]) for b in self.bucket_sizes}
        self._cursor = {b: 0 for b in self.bucket_sizes}

    def _draw(self, bucket: int, count: int) -> List[int]:
        out: List[int] = []
        while len(out) < count:
            perm, cur = self._perm[bucket], self._cursor[bucket]
            take = min(count - len(out), len(perm) - cur)
            out.extend(perm[cur : cur + take].tolist())
            self._cursor[bucket] = cur + take
            if self._cursor[bucket] >= len(perm):
                self._perm[bucket] = (
                    self.rng.permutation(self.groups[bucket])
                    if self.shuffle
                    else np.array(self.groups[bucket])
                )
                self._cursor[bucket] = 0
        return out

    def __iter__(self) -> Iterator[Tuple[int, GraphBatch]]:
        while True:
            bucket = int(self.rng.choice(self.bucket_sizes, p=self.bucket_probs))
            idx = self._draw(bucket, self.batch_size)
            mols = [self.dataset[i] for i in idx]
            yield bucket, pad_molecules(
                mols, bucket, self.edge_order, batch_size=self.batch_size
            )

    def epoch_batches(self) -> Iterator[Tuple[int, GraphBatch]]:
        """One pass over the dataset in order (for validation). Final partial
        batch is padded with empty graphs unless drop_last."""
        for bucket in self.bucket_sizes:
            idxs = self.groups[bucket]
            for start in range(0, len(idxs), self.batch_size):
                chunk = idxs[start : start + self.batch_size]
                if len(chunk) < self.batch_size and self.drop_last and start > 0:
                    continue
                mols = [self.dataset[i] for i in chunk]
                yield bucket, pad_molecules(
                    mols, bucket, self.edge_order, batch_size=self.batch_size
                )


def prefetch(iterator, size: int = 2):
    """Background-thread prefetch so host collation overlaps device compute."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
