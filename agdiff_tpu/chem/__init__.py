from agdiff_tpu.chem.constants import (  # noqa: F401
    BOND_TYPES,
    BOND_NAMES,
    NUM_BOND_TYPES,
    BondType,
    ATOMIC_NUMBERS,
    ATOM_SYMBOLS,
)
from agdiff_tpu.chem.mol import Molecule  # noqa: F401
from agdiff_tpu.chem.rmsd import kabsch_rmsd, best_rmsd  # noqa: F401
