"""Sharded-parameter training layouts: FSDP (ZeRO-3 style) and tensor
parallelism over a 2-D device mesh.

The flagship QM9/Drugs model is ~2M parameters, so plain DP with replicated
parameters is the efficient production layout (parallel/mesh.py) — at this
size parameter sharding buys nothing and costs collectives. These layouts
exist so the framework scales past that regime (wider/deeper model configs,
memory-constrained chips): both are expressed purely as GSPMD sharding
annotations — parameters and optimizer state sharded over a mesh axis, the
batch sharded over the data axes — and XLA's SPMD partitioner inserts every
collective (all-gather of weights at use for FSDP, activation reductions for
TP). No hand-written communication, exactly like parallel/data_parallel.py.

Layouts (mesh ('dp', 'fsdp') or ('dp', 'tp')):
  * fsdp — the batch's graph axis is sharded over BOTH axes (it is still
    pure data parallelism compute-wise); every parameter / Adam-moment
    tensor above `min_size` elements is sharded on its largest divisible
    axis over 'fsdp'. Peak parameter+optimizer memory drops by ~the 'fsdp'
    axis size; weights are all-gathered just-in-time per layer.
  * tp — the batch is sharded over 'dp' only and replicated over 'tp';
    weight matrices are sharded on a feature axis over 'tp', so each chip
    computes a slice of every layer's features (GSPMD propagates the
    activation shardings and inserts the boundary collectives).

The reference has no analog of any of this (SURVEY.md section 2.5: no
torch.distributed imports anywhere in /root/reference).
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from agdiff_tpu.data.graph_batch import GraphBatch

#: tensors smaller than this many elements stay replicated (biases, BN
#: vectors, scheduler scalars — sharding them saves nothing and fragments
#: the layout)
MIN_SHARD_SIZE = 1024


def make_hybrid_mesh(num_devices: int, model_parallel: int,
                     model_axis: str = "fsdp", data_axis: str = "dp") -> Mesh:
    """A ('dp', model_axis) mesh: num_devices = dp * model_parallel.

    On real hardware the model axis should map to the innermost (fastest
    ICI) dimension; device order here follows jax.devices(), which already
    enumerates chips in torus order on TPU.
    """
    if num_devices % model_parallel:
        raise ValueError(
            f"{num_devices} devices not divisible by "
            f"model_parallel={model_parallel}"
        )
    devices = jax.devices()[:num_devices]
    if len(devices) < num_devices:
        raise ValueError(
            f"requested {num_devices} devices, have {len(devices)}"
        )
    arr = np.array(devices).reshape(num_devices // model_parallel,
                                    model_parallel)
    return Mesh(arr, (data_axis, model_axis))


def spec_for_array(x, n_shard: int, axis_name: str,
                   min_size: int = MIN_SHARD_SIZE) -> P:
    """PartitionSpec for one tensor: shard the largest axis divisible by
    n_shard; replicate scalars, small tensors, and indivisible shapes."""
    shape = tuple(getattr(x, "shape", ()))
    if not shape or math.prod(shape) < min_size:
        return P()
    best = None
    for i, d in enumerate(shape):
        if d > 1 and d % n_shard == 0:
            if best is None or d >= shape[best]:
                best = i
    if best is None:
        return P()
    return P(*[axis_name if i == best else None for i in range(len(shape))])


def state_specs(state, mesh: Mesh, axis: str,
                min_size: int = MIN_SHARD_SIZE):
    """PartitionSpec pytree for a TrainState (params, Adam moments, BN
    stats, scheduler scalars — shape-driven, so the optax tree that mirrors
    the param shapes gets the matching layout automatically)."""
    n = mesh.shape[axis]
    return jax.tree_util.tree_map(
        lambda x: spec_for_array(x, n, axis, min_size), state
    )


def state_shardings(state, mesh: Mesh, axis: str,
                    min_size: int = MIN_SHARD_SIZE):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), state_specs(state, mesh, axis,
                                                      min_size)
    )


def shard_train_state(state, mesh: Mesh, axis: str,
                      min_size: int = MIN_SHARD_SIZE):
    """Place a (host or replicated) TrainState with params/optimizer state
    sharded over `axis`."""
    return jax.tree_util.tree_map(
        jax.device_put, state, state_shardings(state, mesh, axis, min_size)
    )


def _graph_batch_sharding(mesh: Mesh, axes) -> GraphBatch:
    spec = tuple(axes) if len(axes) > 1 else axes[0]
    sh = NamedSharding(mesh, P(spec))
    return GraphBatch(atom_type=sh, pos=sh, node_mask=sh, bond_adj=sh,
                      graph_mask=sh)


def make_sharded_train_step(model, config, mesh: Mesh, state,
                            mode: str = "fsdp", donate: bool = False,
                            min_size: int = MIN_SHARD_SIZE):
    """The train step jitted with sharded-parameter in/out layouts.

    mode='fsdp': batch sharded over every mesh axis, state sharded over
    'fsdp'. mode='tp': batch sharded over the non-'tp' axes, state sharded
    over 'tp'. `state` is only used as a shape/structure template for the
    sharding trees; call shard_train_state with the same (mesh, axis,
    min_size) to place the live state.
    """
    from agdiff_tpu.train.train_step import make_train_step

    axis = {"fsdp": "fsdp", "tp": "tp"}[mode]
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no '{axis}' axis")
    batch_axes = (
        tuple(mesh.axis_names) if mode == "fsdp"
        else tuple(a for a in mesh.axis_names if a != "tp")
    )
    state_sh = state_shardings(state, mesh, axis, min_size)
    batch_sh = _graph_batch_sharding(mesh, batch_axes)
    repl = NamedSharding(mesh, P())

    inner = make_train_step(model, config, jit=False)
    return jax.jit(
        inner,
        in_shardings=(state_sh, batch_sh, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,) if donate else (),
    )


def shard_graph_batch_over(batch: GraphBatch, mesh: Mesh, axes) -> GraphBatch:
    """Place a host GraphBatch with the graph axis sharded over `axes`."""
    sh = _graph_batch_sharding(mesh, tuple(axes))
    return jax.tree_util.tree_map(jax.device_put, batch, sh)
