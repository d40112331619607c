"""Annealed Langevin dynamics sampler as a single jit-compiled lax.scan.

Reference: src/agdiff/models/epsnet/dualenc.py:441-547
(langevin_dynamics_sample_diffusion) — a 5000-iteration Python loop with a
host device sync (`pos.clone().cpu()`) every step. Here the whole ladder is
one `lax.scan` on device:

  * per-step radius-graph recompute is the dense predicate inside the model;
  * the NaN guard (dualenc.py:539-541) becomes a per-graph flag accumulated
    in the scan carry — no host round-trips; the caller retries flagged
    molecules with clip_local=20 (matching scripts/test.py:144-181);
  * the trajectory, if requested, is collected as strided scan outputs
    instead of a per-step host copy.

Parity notes (SURVEY.md 2.6): the reference accepts sampling_type/eta but
always runs this same annealed-Langevin update; there is no DDIM/DDPM-noisy
branch (dualenc.py:437-439 threads the kwargs, 462-546 never reads them —
compute_alpha at 463-466 is dead). The 'ld' update is
    step = step_lr * (sigma_i / 0.01)^2
    pos <- pos + step * eps_pos / sigma_i + sqrt(2*step) * xi,
then per-graph CoM centering (dualenc.py:526-542).

Extension (sampling_type='generalized'): a REAL DDIM update (Song et al.
2020) in the model's scaled parameterization. Training perturbs pos by
sigma_t * eps and regresses eq(d_target) with d_target = (d_gt - d~)/sigma
(models/loss.py:73), so the assembled drift eps_pos estimates
(x0 - pos_t)/sigma_t = -eps; with eps_hat = -eps_pos and
pos_t = x0 + sigma_t * eps the DDIM step x-space algebra reduces to
    s      = eta * sigma_j * sqrt(1 - a_i/a_j) / sqrt(1 - a_i)   (noise)
    pos'   = pos + (sqrt(sigma_j^2 - s^2) - sigma_i) * eps_hat + s * z
(eta=0 deterministic DDIM; j = next, lower-noise timestep). Combined with
the 'strided' ladder this gives quality-gated few-step sampling the
reference cannot do (its only knob, n_steps < T, truncates the suffix and
never reaches high noise levels).

At eta=0 the DDIM step is Euler on the probability-flow ODE
dx/dsigma = eps_hat(x, sigma); solver='heun' upgrades it to Heun's method
(Karras et al. 2022 Alg. 1): predict with the current slope, re-evaluate
the score at the predicted point and the NEXT noise level, average the two
slopes. 2 model evals per step, ~2x fewer steps at equal quality; the final
step (sigma_j = 0) stays Euler as in Karras.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from agdiff_tpu.data.graph_batch import GraphBatch
from agdiff_tpu.models.schedules import Diffusion
from agdiff_tpu.ops.geometry import center_pos, clip_norm, eq_transform_dense


@dataclass(frozen=True)
class SamplerConfig:
    """Sampling hyperparameters (reference: scripts/test.py:40-75 defaults)."""

    n_steps: int = 5000
    ladder: str = "suffix"       # 'suffix' = reference semantics (the LAST
    #   n_steps noise levels, dualenc.py:474); 'strided' = n_steps levels
    #   evenly spaced over the FULL schedule — a fast-sampling extension the
    #   reference does not have (fewer steps, full noise range)
    unroll: int = 1              # lax.scan unroll factor (pipelining)
    step_lr: float = 1.0e-6
    w_global: float = 1.0
    global_start_sigma: float = 0.5
    clip: float = 1000.0
    clip_local: Optional[float] = None
    clip_pos: Optional[float] = None
    extend_order: bool = False   # test-time adjacency is pre-extended
    extend_radius: bool = True
    traj_stride: int = 0         # 0 = no trajectory; k = keep every k-th pos
    denoise_tail: int = 0        # extra NOISE-FREE steps at the final noise
    #   level after the ladder (gradient-only polish toward the mode) — an
    #   extension the reference does not have; quality-gated like 'strided'
    sampling_type: str = "ld"    # 'ld' = reference annealed Langevin;
    #   'generalized' = DDIM (module docstring) — pair with ladder='strided'
    #   and small n_steps for few-step sampling
    eta: float = 1.0             # 'generalized' stochasticity: 0 =
    #   deterministic DDIM, 1 = ancestral-like (ignored by 'ld')
    solver: str = "euler"        # 'generalized' ODE solver: 'euler' = plain
    #   DDIM; 'heun' = 2nd-order (module docstring; requires eta=0; 2 model
    #   evals/step). Ignored by 'ld'.

    def with_clip_local(self, value: float) -> "SamplerConfig":
        return dataclasses.replace(self, clip_local=value)


class SampleResult(NamedTuple):
    pos: jax.Array        # (B, N, 3) final positions
    nan_flags: jax.Array  # (B,) bool — True if NaN appeared for that graph
    traj: Optional[jax.Array]  # (T//stride, B, N, 3) or None


def assemble_drift(out, pos, sigma, cfg: SamplerConfig):
    """The assembled drift eps_pos from a model output at positions `pos`
    and noise level `sigma` (dualenc.py:478-524: local branch + clip, global
    branch gated by global_start_sigma).

    `sigma` may be a scalar (the sampler ladder) or a (B,) per-graph array
    (progressive distillation trains every ladder level in one batch,
    train/distill.py). Shared by the sampler's step scan and the distill
    loss so the student regresses the EXACT function used at sampling time.
    """
    # local branch
    node_eq_local = eq_transform_dense(
        out.edge_inv_local, pos, out.local_mask, out.edge_length
    )
    if cfg.clip_local is not None:
        node_eq_local = clip_norm(node_eq_local, cfg.clip_local)

    # global branch — active once sigma < global_start_sigma
    # (dualenc.py:515-524); computed unconditionally, gated by a factor,
    # to keep the scan body branch-free.
    inv_global = out.edge_inv_global * (
        1.0 - out.local_mask.astype(jnp.float32)
    )
    node_eq_global = eq_transform_dense(
        inv_global, pos, out.edge_mask, out.edge_length
    )
    node_eq_global = clip_norm(node_eq_global, cfg.clip)
    sigma = jnp.asarray(sigma)
    gate = (sigma < cfg.global_start_sigma)
    if sigma.ndim:  # per-graph (B,) -> broadcast over (B, N, 3)
        gate = gate[:, None, None]
    # jnp.where (not multiply-by-zero) so an inactive global branch can
    # never inject NaN/Inf into eps_pos
    node_eq_global = jnp.where(gate, node_eq_global, 0.0)

    return node_eq_local + node_eq_global * cfg.w_global


def langevin_dynamics_sample(
    model,
    variables,
    batch: GraphBatch,
    pos_init: jax.Array,
    key: jax.Array,
    diffusion: Diffusion,
    config: SamplerConfig,
    forward_fn=None,
) -> SampleResult:
    """Run the annealed Langevin ladder. pos_init is standard normal noise
    (reference: scripts/test.py:146); it is scaled by sigmas[-1] here
    (dualenc.py:476). If forward_fn is given (the optimized inference path,
    models/fast_forward.py) it is used instead of model.apply."""
    sigmas = jnp.asarray(diffusion.sigmas, jnp.float32)  # (T,)
    alphas = jnp.asarray(diffusion.alphas, jnp.float32)  # (T,) cumprod
    T = diffusion.num_timesteps
    cfg = config
    if cfg.sampling_type not in ("ld", "generalized"):
        raise ValueError(f"unknown sampling_type {cfg.sampling_type!r}")
    if cfg.solver not in ("euler", "heun"):
        raise ValueError(f"unknown solver {cfg.solver!r}")
    if (cfg.solver == "heun" and cfg.sampling_type == "generalized"
            and cfg.eta != 0.0):
        raise ValueError("solver='heun' integrates the probability-flow "
                         "ODE and requires eta=0")
    node_mask3 = batch.node_mask[..., None]

    pos = pos_init * sigmas[-1] * node_mask3

    # position-independent per-ladder data (e.g. the tight engine's packed
    # pair lists) is built ONCE here, outside the step scan
    prepare = getattr(forward_fn, "prepare", None)
    fwd_kwargs = {} if prepare is None else {"pairs": prepare(batch)}

    def eps_at(p, sigma):
        """The assembled drift eps_pos at positions p and noise level sigma
        (assemble_drift above)."""
        if forward_fn is not None:
            out = forward_fn(
                batch.replace(pos=p),
                extend_order=cfg.extend_order,
                extend_radius=cfg.extend_radius,
                **fwd_kwargs,
            )
        else:
            out = model.apply(
                variables,
                batch.replace(pos=p),
                train=False,
                extend_order=cfg.extend_order,
                extend_radius=cfg.extend_radius,
            )
        return assemble_drift(out, p, sigma, cfg)

    def make_step(noise_on: bool, update: str = cfg.sampling_type):
      def step(carry, ij):
        i, j = ij[0], ij[1]
        pos, key, nan_flags = carry
        key, noise_key = jax.random.split(key)
        sigma_i = sigmas[i]
        eps_pos = eps_at(pos, sigma_i)

        if update == "generalized":
            # DDIM in the scaled parameterization (module docstring):
            # pos' = pos + (sqrt(sig_j^2 - s^2) - sig_i) * eps_hat + s*z
            a_i = alphas[i]
            a_j = jnp.where(j >= 0, alphas[jnp.maximum(j, 0)], 1.0)
            sig2_j = jnp.where(j >= 0,
                               jnp.square(sigmas[jnp.maximum(j, 0)]), 0.0)
            s2 = (cfg.eta ** 2) * sig2_j * (1.0 - a_i / a_j) / (1.0 - a_i)
            s2 = jnp.clip(s2, 0.0, sig2_j)
            c_eps = jnp.sqrt(sig2_j - s2)
            eps_hat = -eps_pos
            pos_next = pos + (c_eps - sigma_i) * eps_hat
            if cfg.solver == "heun":
                # eta=0 (validated) so c_eps == sigma_j: pos_next is the
                # Euler predictor. Re-evaluate the slope at the predicted
                # point and the NEXT noise level, average (Karras Alg. 1);
                # the final step (sigma_j = 0) stays Euler.
                eps_hat2 = -eps_at(pos_next, jnp.sqrt(sig2_j))
                pos_heun = pos + (c_eps - sigma_i) * 0.5 * (
                    eps_hat + eps_hat2)
                pos_next = jnp.where(j >= 0, pos_heun, pos_next)
            if noise_on:
                noise = jax.random.normal(
                    noise_key, pos.shape, pos.dtype) * node_mask3
                pos_next = pos_next + noise * jnp.sqrt(s2)
        else:
            step_size = cfg.step_lr * (sigma_i / 0.01) ** 2
            pos_next = pos + step_size * eps_pos / sigma_i
            if noise_on:
                noise = jax.random.normal(
                    noise_key, pos.shape, pos.dtype) * node_mask3
                pos_next = pos_next + noise * jnp.sqrt(step_size * 2.0)
        # per-graph NaN guard (dualenc.py:539-541), flag instead of raise
        nan_now = jnp.any(~jnp.isfinite(pos_next), axis=(1, 2))
        nan_flags = nan_flags | nan_now
        # keep NaNs from propagating into later steps of *other* graphs
        pos_next = jnp.where(jnp.isfinite(pos_next), pos_next, 0.0)
        pos_next = center_pos(pos_next, batch.node_mask)
        if cfg.clip_pos is not None:
            pos_next = jnp.clip(pos_next, -cfg.clip_pos, cfg.clip_pos)
        return (pos_next, key, nan_flags), pos_next

      return step

    step = make_step(True)

    if cfg.ladder == "strided":
        indices = jnp.round(
            jnp.linspace(T - 1, 0, cfg.n_steps)
        ).astype(jnp.int32)
    else:
        indices = jnp.arange(T - 1, T - cfg.n_steps - 1, -1)
    # each scan element is (current, next) — 'generalized' jumps straight to
    # the next ladder level; the final next is -1 (clean, sigma=0)
    steps = jnp.stack(
        [indices,
         jnp.concatenate([indices[1:], jnp.full((1,), -1, indices.dtype)])],
        axis=1)
    init = (pos, key, jnp.zeros((batch.num_graphs,), bool))

    if cfg.traj_stride and cfg.traj_stride > 0:
        stride = cfg.traj_stride
        n_outer = cfg.n_steps // stride

        def outer(carry, idx_chunk):
            carry, _ = jax.lax.scan(step, carry, idx_chunk)
            return carry, carry[0]

        chunks = steps[: n_outer * stride].reshape(n_outer, stride, 2)
        (pos, key, nan_flags), traj = jax.lax.scan(outer, init, chunks)
        rem = steps[n_outer * stride :]
        if rem.shape[0]:
            (pos, key, nan_flags), _ = jax.lax.scan(
                step, (pos, key, nan_flags), rem
            )
    else:
        (pos, key, nan_flags), _ = jax.lax.scan(
            step, init, steps, unroll=cfg.unroll
        )
        traj = None

    if cfg.denoise_tail:
        # gradient-only polish at the final noise level: the noise-free
        # Langevin update in every mode (a generalized step at (i, i) would
        # be a no-op — sigma_j == sigma_i)
        tail = jnp.full((cfg.denoise_tail, 2), indices[-1], jnp.int32)
        (pos, key, nan_flags), _ = jax.lax.scan(
            make_step(False, update="ld"), (pos, key, nan_flags), tail
        )

    return SampleResult(pos=pos, nan_flags=nan_flags, traj=traj)


def build_sampler(model, diffusion: Diffusion, config: SamplerConfig):
    """A jit-compiled sampler closure; config is baked in statically."""

    @partial(jax.jit, static_argnums=())
    def run(variables, batch: GraphBatch, pos_init, key):
        return langevin_dynamics_sample(
            model, variables, batch, pos_init, key, diffusion, config
        )

    return run


def build_fast_sampler(model_config, variables, diffusion: Diffusion,
                       config: SamplerConfig, use_pallas=None,
                       compute_dtype=None, engine: Optional[str] = None,
                       pair_capacity: Optional[int] = None,
                       shared_pairs: bool = False, tabulate: int = 0,
                       mesh=None, filter_dtype=None, store_dtype=None):
    """Sampler over an optimized inference path. engine:
      * None/'xla'/'pallas' — models/fast_forward.py (folded BatchNorm;
        'pallas' adds the per-consumer fused kernels);
      * 'stack' — fast_forward with stack_filters=True: all 12 filter MLPs
        as one wide matmul, distance-weight/envelope products in packed
        space, one F=192 mirror+aggregate per block (value-identical);
      * 'tight' — models/tight_forward.py (per-graph packed pairs sized by
        `pair_capacity`, MXU one-hot aggregation — the fastest engine);
      * 'approx' / 'tight-approx' — the xla / tight engine with the hot
        transcendentals replaced by the sub-bf16-noise polynomial
        approximations in ops/approx.py (quality-gated, not bit-exact);
      * 'mono' — ops/pallas/monolithic.py, the whole per-step forward as ONE
        Pallas kernel (edge tensors never leave VMEM; measured SLOWER than
        XLA fusion at bf16 — kept as the kernel-design testbed);
      * 'slim' / 'slim8' — the xla engine with narrow STORAGE of the
        step's largest buffers (store_dtype=bfloat16 / float8_e4m3fn,
        fast_forward.py) — the step is HBM-traffic-bound (roofline) and
        those buffers are f32 today (quality-gated, not bit-exact);
      * 'tight-slim' / 'tight-slim8' — the same narrowing applied to the
        tight engine's remaining f32 buffers (GIN messages, pair-score
        chains; tight_forward.py) — the tight step is HBM-bound at Drugs
        size too (quality-gated, not bit-exact);
      * 'slim2' — alias of 'slim' kept for the round-4 A/B record:
        score_dots (one-hot-dot pair-score endpoints + split first score
        matmul) measured 1.029x and is now the default packed-path
        behavior of every fast_forward engine;
      * 'pk' — the slim engine with every interaction block's
        mirror+aggregate replaced by the fused packed-pair Pallas kernel
        (ops/pallas/block_packed.py): filter MLPs + one-hot endpoint
        aggregation in VMEM, no (B, N, N, F) filter mirrors in HBM — the
        dominant traffic of the slim step (tools/hlo_traffic.py);
      * 'pks' / 'pksg' / 'pksf' — the slim engine with growing spans of
        the forward as ONE Pallas kernel (ops/pallas/stack_packed.py):
        'pks' = the whole interaction stack (h carried across all blocks
        in VMEM, e_packed read once, node-side block math in-kernel —
        removes the per-block kernel's dispatch boundaries and boundary
        I/O that made 'pk' a wash); 'pksg' adds the GIN local branch
        (no (B, N^2, H) message mirror); 'pksf' adds both pair-score
        heads — the kernel emits only the two (B, P) packed score
        planes and node states never touch HBM;
      * 'tight-pks' / 'tight-pksg' / 'tight-pksf' — the same kernel
        spans over the TIGHT engine's shared molecule-sized pair list
        (tight_forward.py packed_stack=...): kernel pair volume scales
        with the molecule (capacity), not the bucket, composing the
        tight engine's Drugs-density volume cut with the whole-stack
        kernel's VMEM-resident node states. shared_pairs=True required.
    Parameters are baked into the closure (weights fold once on host).

    mesh: a jax.sharding.Mesh makes the returned sampler data-parallel —
    the molecule batch (and pos_init) is sharded over the mesh axes and
    each chip runs the ladder on its shard; the engines are pure per-graph
    math, so SPMD partitioning needs no communication. This is how the
    tight engine's Drugs-size win composes with multi-chip generation
    (module-path analog: parallel.data_parallel.make_parallel_sampler).

    HAZARD: `pair_capacity` must be >= n_real*(n_real-1)//2 for every graph
    that will run through the sampler — packed pair lists are silently
    truncated past capacity (tight_forward.prepare_pairs), which drops edges
    and generates wrong conformers. Size it with
    tight_forward.pair_capacity_for(max_real_nodes) as GenerationRunner does
    (eval/generate.py), or pass None for full-bucket capacity (always safe)."""
    import jax.numpy as jnp

    from agdiff_tpu.models.fast_forward import build_fast_forward
    from agdiff_tpu.ops.pallas.fused import pallas_available

    if compute_dtype is None:
        compute_dtype = (jnp.bfloat16 if model_config.dtype == "bfloat16"
                         else jnp.float32)
    edge_dtype = None
    if engine and engine.endswith("-e16"):
        # '<engine>-e16': narrow the edge-encoder chain to bf16 — the last
        # f32 span in the slim/pksf residual (~160 MB/step of gelu-MLP
        # intermediates, tools/hlo_traffic). Composes with any engine.
        edge_dtype = jnp.bfloat16
        engine = engine[:-len("-e16")]
    approx = bool(engine) and engine.endswith("approx")
    if approx:
        # 'approx' / 'tight-approx' / '<pks-engine>-approx': polynomial
        # transcendentals compose with any engine; inside the stack kernel
        # they attack EXPOSED VPU work (in XLA they were bandwidth-hidden)
        engine = {"approx": None, "tight-approx": "tight"}.get(
            engine, engine[:-len("-approx")])
    packed_kernel = engine == "pk"
    packed_stack = {"pks": "schnet", "pksg": "gin", "pksf": "full",
                    "tight-pks": "schnet", "tight-pksg": "gin",
                    "tight-pksf": "full"}.get(engine, False)
    if engine in ("slim", "slim2", "slim8", "tight-slim", "tight-slim8",
                  "pk", "pks", "pksg", "pksf",
                  "tight-pks", "tight-pksg", "tight-pksf"):
        if store_dtype is None:
            store_dtype = (jnp.float8_e4m3fn if engine.endswith("8")
                           else jnp.bfloat16)
        engine = "tight" if engine.startswith("tight") else None
    if engine == "tight":
        from agdiff_tpu.models.tight_forward import build_tight_forward

        forward_fn = build_tight_forward(model_config, variables,
                                         compute_dtype=compute_dtype,
                                         capacity=pair_capacity,
                                         shared=shared_pairs,
                                         tabulate=tabulate,
                                         approx=approx,
                                         filter_dtype=filter_dtype,
                                         store_dtype=store_dtype,
                                         packed_stack=packed_stack,
                                         edge_dtype=edge_dtype)
    elif engine == "mono":
        from agdiff_tpu.ops.pallas.monolithic import build_monolithic_forward

        forward_fn = build_monolithic_forward(model_config, variables,
                                              compute_dtype=compute_dtype)
    else:
        if use_pallas is None:
            use_pallas = (engine == "pallas") and pallas_available()
        forward_fn = build_fast_forward(model_config, variables,
                                        use_pallas=use_pallas,
                                        compute_dtype=compute_dtype,
                                        approx=approx,
                                        filter_dtype=filter_dtype,
                                        stack_filters=(engine == "stack"),
                                        store_dtype=store_dtype,
                                        packed_kernel=packed_kernel,
                                        packed_stack=packed_stack,
                                        edge_dtype=edge_dtype)

    def run(batch: GraphBatch, pos_init, key):
        return langevin_dynamics_sample(
            None, None, batch, pos_init, key, diffusion, config,
            forward_fn=forward_fn,
        )

    if mesh is None:
        return jax.jit(run)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from agdiff_tpu.parallel.data_parallel import _batch_spec

    batch_sh = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), _batch_spec(mesh)
    )
    axes = tuple(mesh.axis_names)
    pos_sh = NamedSharding(mesh, P(axes if len(axes) > 1 else axes[0]))
    repl = NamedSharding(mesh, P())
    return jax.jit(run, in_shardings=(batch_sh, pos_sh, repl))
