"""Chemistry constants, independent of RDKit.

The reference derives its bond-type vocabulary from RDKit's BondType enum at
import time (reference: src/agdiff/utils/chem.py:17-18 —
``BOND_TYPES = {t: i for i, t in enumerate(BT.names.values())}``), which makes
the integer ids silently depend on the installed RDKit version. Here the
enumeration is pinned explicitly to the RDKit 2022+ ordering (22 entries) so
data and checkpoints are portable and RDKit is optional.

Bond-type integer semantics (used as the typed-adjacency vocabulary):
  0                      = UNSPECIFIED; doubles as the radius-graph edge type
                           (reference: common.py:209 unspecified_type_number=0)
  1..21                  = chemical bond types below
  NUM_BOND_TYPES + k - 1 = k-hop "higher order" edges, k in {2, 3}
                           (reference: common.py:183-184) -> 23, 24
"""

from __future__ import annotations

import enum


class BondType(enum.IntEnum):
    """Mirror of rdkit.Chem.rdchem.BondType names/ordering (22 entries)."""

    UNSPECIFIED = 0
    SINGLE = 1
    DOUBLE = 2
    TRIPLE = 3
    QUADRUPLE = 4
    QUINTUPLE = 5
    HEXTUPLE = 6
    ONEANDAHALF = 7
    TWOANDAHALF = 8
    THREEANDAHALF = 9
    FOURANDAHALF = 10
    FIVEANDAHALF = 11
    AROMATIC = 12
    IONIC = 13
    HYDROGEN = 14
    THREECENTER = 15
    DATIVEONE = 16
    DATIVE = 17
    DATIVEL = 18
    DATIVER = 19
    OTHER = 20
    ZERO = 21


#: name -> integer id (same mapping as reference BOND_TYPES keyed by enum value)
BOND_TYPES = {bt: int(bt) for bt in BondType}
#: integer id -> name (reference BOND_NAMES)
BOND_NAMES = {int(bt): bt.name for bt in BondType}
NUM_BOND_TYPES = len(BondType)  # 22

# Edge types for k-hop extended edges (k = 2, 3 with default edge_order=3).
def higher_order_type(k: int) -> int:
    """Edge type id for a k-hop edge (reference: common.py:183-184)."""
    return NUM_BOND_TYPES + k - 1


# Minimal periodic table (symbol <-> atomic number) for the elements present in
# GEOM QM9/Drugs and common biomolecules; extend as needed. Used for host-side
# data prep and the native RMSD evaluator (atom labels).
ATOM_SYMBOLS = {
    1: "H", 5: "B", 6: "C", 7: "N", 8: "O", 9: "F", 14: "Si", 15: "P",
    16: "S", 17: "Cl", 33: "As", 35: "Br", 53: "I", 80: "Hg", 83: "Bi",
}
ATOMIC_NUMBERS = {v: k for k, v in ATOM_SYMBOLS.items()}
