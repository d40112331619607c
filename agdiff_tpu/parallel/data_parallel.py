"""Data-parallel train step and sampler over a device mesh.

jit + sharding annotations: the batch's leading (graph) axis is sharded over
'dp', parameters/optimizer state are replicated, and XLA's SPMD partitioner
inserts the gradient all-reduce (psum over ICI). This is the whole
communication story for this model class — see parallel/mesh.py.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from agdiff_tpu.data.graph_batch import GraphBatch


def _batch_spec(mesh: Mesh = None) -> GraphBatch:
    """PartitionSpec pytree for GraphBatch: shard the graph axis over every
    mesh axis (('dcn', 'dp') on a multi-slice mesh, 'dp' otherwise)."""
    axes = tuple(mesh.axis_names) if mesh is not None else ("dp",)
    spec = axes if len(axes) > 1 else axes[0]
    return GraphBatch(
        atom_type=P(spec),
        pos=P(spec),
        node_mask=P(spec),
        bond_adj=P(spec),
        graph_mask=P(spec),
    )


def shard_graph_batch(batch: GraphBatch, mesh: Mesh) -> GraphBatch:
    """Place a host GraphBatch sharded across the mesh."""
    return jax.tree_util.tree_map(
        lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)),
        batch,
        _batch_spec(mesh),
    )


def make_parallel_train_step(model, config, mesh: Mesh, donate: bool = True):
    """DP version of train.train_step.make_train_step."""
    from agdiff_tpu.train.train_step import make_train_step

    inner = make_train_step(model, config, jit=False)

    batch_sh = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), _batch_spec(mesh)
    )
    repl = NamedSharding(mesh, P())
    return jax.jit(
        inner,
        in_shardings=(repl, batch_sh, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_parallel_distill_step(model, config, sampler_cfg, n_student: int,
                               mesh: Mesh, donate: bool = True,
                               weighting: str = "trunc-snr"):
    """DP version of train.distill.make_distill_step: the molecule batch is
    sharded over the mesh, student state and frozen teacher variables are
    replicated, and the SPMD partitioner inserts the gradient all-reduce —
    identical communication story to the train step (the teacher's 2-step
    rollout is pure per-graph math)."""
    from agdiff_tpu.train.distill import make_distill_step

    inner = make_distill_step(model, config, sampler_cfg, n_student,
                              jit=False, weighting=weighting)

    batch_sh = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), _batch_spec(mesh)
    )
    repl = NamedSharding(mesh, P())
    return jax.jit(
        inner,
        in_shardings=(repl, repl, batch_sh, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_parallel_chunked_train_step(model, config, chunk: int, mesh: Mesh,
                                     donate: bool = True):
    """DP version of train.train_step.make_chunked_train_step: K optimizer
    steps per dispatch over a (K, B, ...) stacked batch whose GRAPH axis is
    sharded over the mesh (the K axis is the scan axis, replicated in
    layout). Multi-chip training pays the same per-program dispatch latency
    as single-chip — chunking amortizes it identically."""
    from agdiff_tpu.train.train_step import make_chunked_train_step

    inner = make_chunked_train_step(model, config, chunk, jit=False)

    batch_sh = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, P(None, *tuple(spec))),
        _batch_spec(mesh),
    )
    repl = NamedSharding(mesh, P())
    return jax.jit(
        inner,
        in_shardings=(repl, batch_sh, repl),
        donate_argnums=(0,) if donate else (),
    )


def shard_stacked_batches(stacked: GraphBatch, mesh: Mesh) -> GraphBatch:
    """Place a host (K, B, ...) stacked GraphBatch with the graph axis
    sharded (K replicated as the scan axis)."""
    def _put(x, spec):
        return jax.device_put(
            x, NamedSharding(mesh, P(None, *tuple(spec))))

    return jax.tree_util.tree_map(_put, stacked, _batch_spec(mesh))


def make_parallel_sampler(model, diffusion, sampler_config, mesh: Mesh,
                          forward_fn=None):
    """DP version of sampling.langevin.build_sampler: each chip runs the
    Langevin ladder on its shard of the molecule batch (generation is
    embarrassingly parallel across molecules).

    forward_fn: an optimized inference closure (models/fast_forward.py,
    models/tight_forward.py, ...) used instead of model.apply — same
    contract as langevin_dynamics_sample(forward_fn=...). Parameters are
    baked into the closure, so `variables` is ignored on that path (kept
    in the signature so GenerationRunner can call every sampler variant
    uniformly). The fast-engine builder path is
    sampling.build_fast_sampler(mesh=...); this hook exists for callers
    holding a custom forward closure."""
    from agdiff_tpu.sampling.langevin import langevin_dynamics_sample

    batch_sh = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), _batch_spec(mesh)
    )
    repl = NamedSharding(mesh, P())
    axes = tuple(mesh.axis_names)
    pos_sh = NamedSharding(mesh, P(axes if len(axes) > 1 else axes[0]))

    def run(variables, batch: GraphBatch, pos_init, key):
        return langevin_dynamics_sample(
            model, variables, batch, pos_init, key, diffusion,
            sampler_config, forward_fn=forward_fn,
        )

    return jax.jit(run, in_shardings=(repl, batch_sh, pos_sh, repl))
