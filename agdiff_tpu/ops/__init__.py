from agdiff_tpu.ops.geometry import (  # noqa: F401
    pairwise_distance,
    eq_transform_dense,
    center_pos,
    clip_norm,
)
from agdiff_tpu.ops.graph import (  # noqa: F401
    radius_union_mask,
    extend_graph_order_dense,
)
from agdiff_tpu.ops.masked import (  # noqa: F401
    masked_mean,
    masked_batch_norm_stats,
)
