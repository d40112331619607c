from agdiff_tpu.ops.pallas.fused import (  # noqa: F401
    pair_score_mlp,
    interaction_block_aggregate,
    gine_aggregate,
    pallas_available,
)
