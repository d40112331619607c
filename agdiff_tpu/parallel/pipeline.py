"""Pipeline parallelism (GPipe schedule) over a 'pp' mesh axis.

TPU-native formulation: the pipeline is ONE SPMD program — a `shard_map`
whose body runs a `lax.scan` over schedule ticks, rotating activations
between neighbor stages with `lax.ppermute` (ICI neighbor exchange). Stage
parameters live stacked on a leading stage axis sharded over 'pp', so each
device holds exactly its stage's weights. There is no hand-written
send/recv state machine and no host round-trip per tick; XLA compiles the
whole schedule into one executable.

The schedule is classic GPipe: M microbatches over S stages take M + S - 1
ticks with an (S-1)/(M+S-1) bubble. Every device executes the stage body
every tick (SPMD); inactive ticks are masked with `where`, which is the
standard trade on TPU where control-flow divergence is not available.

Because the whole pipeline is built from differentiable primitives (scan,
ppermute, where), `jax.grad` through `pipeline_apply` IS pipeline-parallel
training: XLA schedules the backward as the reverse pipeline with the same
rotation pattern (tested in tests/test_pipeline_parallel.py).

The flagship model is ~2M params, so pp is a scaling capability (deep
num_convs configs / stacked models), not the production layout — same
status as FSDP/TP in parallel/sharded.py. The reference has no distributed
code at all (SURVEY.md section 2.5).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _vary(x, axis: str):
    """Mark x as device-varying over `axis` for shard_map replication
    typing (pvary was renamed pcast(..., to='varying') in newer jax)."""
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is not None:
        return pcast(x, axis, to="varying")
    return jax.lax.pvary(x, (axis,))


def make_pp_mesh(num_devices: int, axis_name: str = "pp") -> Mesh:
    """A 1-D pipeline mesh; stage i lives on device i (neighbor order, so
    ppermute rides ICI neighbor links on real hardware)."""
    import numpy as np

    devices = jax.devices()[:num_devices]
    if len(devices) < num_devices:
        raise ValueError(
            f"requested {num_devices} devices, have {len(devices)}")
    return Mesh(np.array(devices), (axis_name,))


def stack_stage_params(per_stage_params):
    """Stack S structurally identical per-stage pytrees along a new leading
    stage axis (the axis that shards over 'pp')."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *per_stage_params)


def pipeline_apply(stage_fn: Callable, stage_params, x, *, mesh: Mesh,
                   axis: str = "pp"):
    """Run x's leading-axis microbatches through S pipeline stages.

    stage_fn(params, xm) -> xm    (shape/dtype-preserving stage; xm may be
                                   an arbitrary pytree of arrays)
    stage_params: pytree with leading axis S = mesh.shape[axis]
    x: pytree of (M, ...) microbatch-stacked arrays (replicated input;
       stage 0 ingests them)

    Returns the (M, ...) output pytree, replicated. Differentiable in both
    stage_params and x.
    """
    tm = jax.tree_util.tree_map
    S = mesh.shape[axis]
    M = jax.tree_util.tree_leaves(x)[0].shape[0]
    lead = jax.tree_util.tree_leaves(stage_params)[0].shape[0]
    if lead != S:
        raise ValueError(
            f"stage_params leading axis {lead} != mesh '{axis}' size {S}")

    def body(params, xs):
        p = tm(lambda a: a[0], params)
        i = jax.lax.axis_index(axis)
        # the carry is device-varying (each stage holds different data):
        # mark the initial zeros as such for shard_map's replication types
        state = tm(lambda a: _vary(jnp.zeros_like(a[0]), axis), xs)
        buf = tm(lambda a: _vary(jnp.zeros_like(a), axis), xs)

        def tick(carry, t):
            state, buf = carry
            # stage 0 ingests microbatch t while t is in range
            tc = jnp.clip(t, 0, M - 1)
            state_in = tm(lambda a, s: jnp.where(i == 0, a[tc], s), xs, state)
            active = (t >= i) & (t - i < M)
            out = stage_fn(p, state_in)
            out = tm(lambda o, s: jnp.where(active, o, s), out, state_in)
            # last stage collects its finished microbatch
            m = jnp.clip(t - i, 0, M - 1)
            take = (i == S - 1) & active
            buf = tm(lambda b, o: b.at[m].set(jnp.where(take, o, b[m])),
                     buf, out)
            # rotate activations to the next stage over ICI
            state = tm(
                lambda o: jax.lax.ppermute(
                    o, axis, [(j, (j + 1) % S) for j in range(S)]),
                out)
            return (state, buf), None

        (state, buf), _ = jax.lax.scan(
            tick, (state, buf), jnp.arange(M + S - 1))
        # results live on the last stage; replicate via masked psum
        return tm(
            lambda b: jax.lax.psum(
                jnp.where(i == S - 1, b, jnp.zeros_like(b)), axis),
            buf)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
    )
    return fn(stage_params, x)


def jit_pipeline(stage_fn: Callable, mesh: Mesh, axis: str = "pp"):
    """jit-wrapped pipeline_apply with stage params placed stage-per-device."""
    f = jax.jit(partial(pipeline_apply, stage_fn, mesh=mesh, axis=axis))

    def place(stage_params):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(
                a, NamedSharding(mesh, P(*([axis] + [None] * (a.ndim - 1))))),
            stage_params)

    return f, place


def schnet_pipeline(forward, mesh: Mesh, axis: str = "pp"):
    """Pipeline the folded SchNet interaction stack of a
    models.fast_forward.build_fast_forward forward over the 'pp' mesh.

    Stages are contiguous groups of interaction blocks (len(blocks) must be
    divisible by the mesh axis size). Returns (run, stacked_params):
    run(stacked_params, payload) where payload = (h, edge_attr, el,
    env_mask) stacked on a leading microbatch axis; the edge context rides
    through the pipeline with the activations (it is per-microbatch data).

    Use build_fast_forward(..., use_pallas=False) — the stage body must be
    shard_map-compatible.
    """
    blocks = forward.schnet_blocks
    S = mesh.shape[axis]
    if len(blocks) % S:
        raise ValueError(
            f"{len(blocks)} blocks not divisible into {S} stages")
    per = len(blocks) // S
    stages = [tuple(blocks[i * per:(i + 1) * per]) for i in range(S)]
    stacked = stack_stage_params(stages)
    block = forward.schnet_block

    def stage_fn(p, payload):
        h, e, el, env = payload
        for blk in p:
            h = block(blk, h, e, el, env)
        return (h, e, el, env)

    def run(stage_params, payload):
        return pipeline_apply(stage_fn, stage_params, payload,
                              mesh=mesh, axis=axis)[0]

    return run, stacked
