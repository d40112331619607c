"""Denoising-diffusion training loss.

Reference: src/agdiff/models/epsnet/dualenc.py:284-395 (get_loss_diffusion).
All steps are masked dense ops; per-node losses for padded nodes are exactly
zero and excluded from the mean.

Faithfully kept semantics:
  * antithetic time sampling: t ~ U[0, T) for half the graphs, T-1-t for the
    mirror half (dualenc.py:304-309);
  * perturbation kernel pos~ = pos + eps * sqrt(1-a)/sqrt(a) with per-graph
    a = alpha_bar[t] (310-315);
  * d_target = (d_gt - d~) * sqrt(a)/sqrt(1-a) per edge (348-350);
  * global mask = (d~ <= cutoff or local) and not local (352-357);
  * loss = mean_nodes[ 2*|eq(global) - eq(target_global)|^2
                     + 5*|eq(local)  - eq(target_local)|^2 ] (368-387);
  * anneal_power is accepted and unused, as in the reference (262).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from agdiff_tpu.data.graph_batch import GraphBatch
from agdiff_tpu.models.dualenc import ModelOutput
from agdiff_tpu.ops.geometry import eq_transform_dense, pairwise_distance


class LossOutput(NamedTuple):
    loss: jax.Array          # scalar — masked mean over real nodes
    loss_global: jax.Array   # scalar
    loss_local: jax.Array    # scalar
    per_node: jax.Array      # (B, N) unreduced loss (reference's `loss`)


def sample_timesteps(key: jax.Array, num_graphs: int, num_timesteps: int):
    """Antithetic low-discrepancy timestep sampling (dualenc.py:304-309)."""
    half = jax.random.randint(
        key, (num_graphs // 2 + 1,), 0, num_timesteps, dtype=jnp.int32
    )
    t = jnp.concatenate([half, num_timesteps - half - 1])[:num_graphs]
    return t


def perturb_positions(
    key: jax.Array, batch: GraphBatch, alphas: jax.Array, t: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Returns (pos_perturbed, a) with a = alpha_bar[t] per graph."""
    a = alphas[t]  # (B,)
    noise = jax.random.normal(key, batch.pos.shape, batch.pos.dtype)
    noise = noise * batch.node_mask[..., None]
    scale = jnp.sqrt(1.0 - a) / jnp.sqrt(a)
    pos_perturbed = batch.pos + noise * scale[:, None, None]
    return pos_perturbed, a


def diffusion_loss(
    output: ModelOutput,
    batch: GraphBatch,
    pos_perturbed: jax.Array,
    a: jax.Array,
    cutoff: float,
) -> LossOutput:
    """Compute the dual global/local position-score matching loss given the
    model output evaluated at pos_perturbed."""
    d_gt = pairwise_distance(batch.pos)           # clean distances (B, N, N)
    d_perturbed = output.edge_length              # perturbed distances
    # is_train_edge is all-ones for non-protein data (dualenc.py:570-572),
    # so the d_perturbed override (346) is a no-op here.
    a_edge = a[:, None, None]
    d_target = (d_gt - d_perturbed) / jnp.sqrt(1.0 - a_edge) * jnp.sqrt(a_edge)

    local = output.local_mask
    global_mask = (
        ((d_perturbed <= cutoff) | local) & (~local) & output.edge_mask
    )

    target_pos_global = eq_transform_dense(
        d_target, pos_perturbed, global_mask, d_perturbed
    )
    node_eq_global = eq_transform_dense(
        output.edge_inv_global, pos_perturbed, global_mask, d_perturbed
    )
    loss_global = 2.0 * jnp.sum(
        (node_eq_global - target_pos_global) ** 2, axis=-1
    )  # (B, N)

    target_pos_local = eq_transform_dense(
        d_target, pos_perturbed, local, d_perturbed
    )
    node_eq_local = eq_transform_dense(
        output.edge_inv_local, pos_perturbed, local, d_perturbed
    )
    loss_local = 5.0 * jnp.sum((node_eq_local - target_pos_local) ** 2, axis=-1)

    valid = batch.node_mask & batch.graph_mask[:, None]
    w = valid.astype(jnp.float32)
    count = jnp.maximum(jnp.sum(w), 1.0)
    per_node = (loss_global + loss_local) * w
    return LossOutput(
        loss=jnp.sum(per_node) / count,
        loss_global=jnp.sum(loss_global * w) / count,
        loss_local=jnp.sum(loss_local * w) / count,
        per_node=per_node,
    )
