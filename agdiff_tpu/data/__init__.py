from agdiff_tpu.data.graph_batch import GraphBatch  # noqa: F401
from agdiff_tpu.data.transforms import extend_bond_order  # noqa: F401
from agdiff_tpu.data.bucketing import pick_bucket, pad_molecules  # noqa: F401
from agdiff_tpu.data.dataset import (  # noqa: F401
    ConformationDataset,
    PackedConformationDataset,
)
from agdiff_tpu.data.synthetic import (expand_conformers,  # noqa: F401
                                       random_molecule, synthetic_dataset,
                                       torsion_conformer)
