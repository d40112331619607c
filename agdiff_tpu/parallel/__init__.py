from agdiff_tpu.parallel.mesh import make_mesh, batch_sharding, replicated  # noqa: F401
from agdiff_tpu.parallel.data_parallel import (  # noqa: F401
    make_parallel_train_step,
    make_parallel_sampler,
    shard_graph_batch,
)
from agdiff_tpu.parallel.pipeline import (  # noqa: F401
    make_pp_mesh,
    pipeline_apply,
    schnet_pipeline,
    stack_stage_params,
)
from agdiff_tpu.parallel.sharded import (  # noqa: F401
    make_hybrid_mesh,
    make_sharded_train_step,
    shard_graph_batch_nodes,
    shard_train_state,
)
