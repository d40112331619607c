"""Test-set conformer generation runner.

Mirrors scripts/test.py semantics (reference: scripts/test.py:124-195):
  * per molecule: num_samples = 2 x num_reference_conformers ("2x") or a
    fixed count;
  * pos_init ~ N(0,1) per sample; 5000-step Langevin;
  * NaN handling: molecules whose ladder went non-finite are retried once
    with clip_local=20 (test.py:144-181) — here at chunk granularity using
    the per-graph NaN flags the scan carries (no host sync per step);
  * incremental saves + resume (skip molecules already generated).

TPU-shaped batching: each molecule's samples are generated in fixed-size
chunks (one compiled program per bucket) instead of a per-molecule dynamic
batch, so XLA never recompiles across the test set.
"""

from __future__ import annotations

import os
from dataclasses import replace
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from agdiff_tpu.chem.mol import Molecule
from agdiff_tpu.data.bucketing import pad_molecules, pick_bucket
from agdiff_tpu.models.schedules import Diffusion
from agdiff_tpu.sampling.langevin import SamplerConfig, build_sampler

# engine names that run models/tight_forward.py (per-molecule pair
# capacity + shared pair lists apply to all of them)
_TIGHT_ENGINES = ("tight", "tight-approx", "tight-slim", "tight-slim8",
                  "tight-pks", "tight-pksg", "tight-pksf",
                  "tight-pksf-approx")


def _cpu_device():
    """The local CPU device, for eager PRNG-key arithmetic. On the remote
    TPU backend every eager op (fold_in / split / normal) is a ~25 ms
    host-side dispatch through the tunnel; key math is a handful of uint32
    ops and belongs on the host. Returns None when no CPU backend exists
    (then key math runs wherever the default device is)."""
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


_CPU = None
_CPU_RESOLVED = False


def _host_keys(fn):
    """Run eager PRNG-key computation `fn` on the CPU backend and return
    host numpy (numpy inputs are accepted by both jit dispatch and AOT
    executables, and ride along with the single ladder transfer)."""
    global _CPU, _CPU_RESOLVED
    if not _CPU_RESOLVED:
        _CPU = _cpu_device()
        _CPU_RESOLVED = True
    if _CPU is None:
        return jax.tree_util.tree_map(np.asarray, fn())
    with jax.default_device(_CPU):
        return jax.tree_util.tree_map(np.asarray, fn())


class _SamplerHandle:
    """Uniform (variables, batch, pos_init, key) sampler wrapper.

    fast=True closures bake parameters in and take (batch, pos, key).
    warm() AOT-compiles (jit.lower().compile()) an executable keyed by the
    batch's position shape and __call__ prefers it — jit's own dispatch
    cache does not learn from manual lower/compile, so the executables are
    kept here; batch sizes never warmed fall back to the plain jit path.

    fused=True (single-device runners) additionally moves the pos_init
    noise INSIDE the compiled program: sample() takes init key(s) instead
    of a pre-generated (B, N, 3) noise tensor, so one request costs ONE
    program dispatch + ONE result fetch instead of separate normal() /
    ladder / fetch round-trips (each ~25 ms host-side through the remote
    tunnel). jax.random.normal(key, shape) inside jit is bit-identical to
    the eager call, so results are unchanged. Mesh runners keep the
    unfused path (the fused wrapper would drop the inner jit's
    in_shardings)."""

    def __init__(self, fn, fast: bool, fused: bool = False,
                 per_slot_warm: bool = False):
        self.fn = fn
        self.fast = fast
        self.fused = fused
        # which init-key layout warm() pre-compiles: the base runner draws
        # one whole-batch noise tensor (False), the packed runner one draw
        # per slot (True)
        self._per_slot_warm = per_slot_warm
        self.compiled: Dict[tuple, object] = {}
        self._fused_fns: Dict[bool, object] = {}

    def _args(self, variables, batch, pos_init, key):
        if self.fast:
            return (batch, pos_init, key)
        return (variables, batch, pos_init, key)

    def _fused_fn(self, per_slot: bool):
        fn = self._fused_fns.get(per_slot)
        if fn is None:
            base = self.fn

            def init_noise(keys, shape):
                if per_slot:  # (B, 2) keys -> one (N, 3) draw per slot
                    return jax.vmap(
                        lambda k: jax.random.normal(k, shape[1:]))(keys)
                return jax.random.normal(keys, shape)

            if self.fast:
                def fused(batch, init_keys, run_key):
                    return base(batch,
                                init_noise(init_keys, batch.pos.shape),
                                run_key)
            else:
                def fused(variables, batch, init_keys, run_key):
                    return base(variables, batch,
                                init_noise(init_keys, batch.pos.shape),
                                run_key)
            fn = jax.jit(fused)
            self._fused_fns[per_slot] = fn
        return fn

    def warm(self, variables, batch, pos_abs, key) -> bool:
        sig = tuple(batch.pos.shape)
        if self.fused:
            per_slot = self._per_slot_warm
            fsig = sig + (per_slot,)
            if fsig in self.compiled:
                return False
            keys_abs = jax.ShapeDtypeStruct(
                (batch.pos.shape[0], 2) if per_slot else (2,), jnp.uint32)
            self.compiled[fsig] = self._fused_fn(per_slot).lower(
                *self._args(variables, batch, keys_abs, key)).compile()
            return True
        if sig in self.compiled:
            return False
        if hasattr(self.fn, "lower"):
            self.compiled[sig] = self.fn.lower(
                *self._args(variables, batch, pos_abs, key)).compile()
            return True
        return False

    def sample(self, variables, batch, init_keys, run_key):
        """Fused-init dispatch: init_keys is one (2,) key (whole-batch
        noise draw, base runner) or a (B, 2) stack (per-slot draws, packed
        runner). Falls back to jit when the shape was never warmed."""
        per_slot = np.asarray(init_keys).ndim == 2
        ex = self.compiled.get(tuple(batch.pos.shape) + (per_slot,))
        fn = self._fused_fn(per_slot) if ex is None else ex
        return fn(*self._args(variables, batch, init_keys, run_key))

    def __call__(self, variables, batch, pos_init, key):
        ex = self.compiled.get(tuple(batch.pos.shape))
        # a fused-warmed executable expects init KEYS, not a noise tensor —
        # only a non-fused executable can serve this legacy entry point
        if self.fused:
            ex = None
        fn = self.fn if ex is None else ex
        return fn(*self._args(variables, batch, pos_init, key))


class GenerationRunner:
    def __init__(
        self,
        model,
        variables,
        diffusion: Diffusion,
        sampler_config: SamplerConfig,
        buckets: Sequence[int] = (32, 64),
        chunk_size: int = 64,
        retry_clip_local: float = 20.0,
        mesh=None,
        logger=None,
        use_fast: bool = False,
        model_config=None,
        engine: str = None,
    ):
        self.model = model
        self.variables = variables
        self.diffusion = diffusion
        self.sampler_config = sampler_config
        self.buckets = buckets
        self.chunk_size = chunk_size
        self.mesh = mesh
        self.logger = logger
        self.use_fast = use_fast
        self.model_config = model_config
        # None/'xla' | 'tight' (packed pair lists; this runner's chunks are
        # one molecule repeated -> shared pair list) | 'mono' (Pallas
        # kernel) | 'approx'/'tight-approx' (polynomial transcendentals)
        self.engine = engine
        self._samplers: Dict[tuple, object] = {}
        self.retry_config = sampler_config.with_clip_local(retry_clip_local)

    # one repeated molecule per chunk in this runner -> shared pair lists;
    # PackedGenerationRunner mixes molecules and overrides this
    _tight_shared = True
    # init-noise layout for the fused-init dispatch path: this runner draws
    # one whole-batch tensor per chunk; the packed runner draws per slot
    _per_slot_init = False

    def _engine_for(self, bucket: int) -> Optional[str]:
        """Effective fast-path engine. With no explicit choice, large
        buckets auto-select the tight layout: pair density drops with
        bucket size and the tight engine measures 1.53x fast-xla at N=40,
        2.60x at N=48, 3.18x at N=64 (Drugs size); at N=32 the two are
        within noise. At bf16 compute the QM9-bucket default is the
        whole-stack Pallas kernel engine 'pksf' (ops/pallas/
        stack_packed.py): 1.654 ms/step vs slim's 1.924 on the full
        5000-step protocol (BENCH_r04, 1.16x — the fastest engine) at
        four-metric quality parity with the module path
        (docs/evidence/armR/paired_pksf_gate.txt, round 5; slim's own
        gate is tools/quality_gate_slim.sh). Large buckets use the same
        kernel over the tight pair list ('tight-pksf': 1.549 vs
        tight-slim's 1.984 ms/step = 1.281x at N=64 B=48, round-5 A/B;
        four-metric parity at the Drugs serving recipe,
        docs/evidence/armQ/paired_pksf_gate_drugs.txt). CAVEAT: a COLD
        tight-pksf Mosaic compile is ~16 min (vs ~40 s tight-slim) —
        the repo-local XLA disk cache amortizes it after the first run,
        and serving warms every shape at startup. f32 configs keep the
        f32 XLA path: the kernels/narrowing were quality-gated at the
        production bf16 config, and a user running f32 has asked for
        full-precision numerics."""
        if self.engine is not None:
            return self.engine
        if not self.use_fast:
            return None
        slim = (self.model_config is not None
                and str(self.model_config.dtype) == "bfloat16")
        # the Mosaic kernel engines need a real TPU backend; CPU runs
        # (tests, AGDIFF_PLATFORM=cpu) keep the pure-XLA slim engines
        tpu = jax.default_backend() == "tpu"
        if self._tight_shared and bucket >= 40:
            if slim:
                return "tight-pksf" if tpu else "tight-slim"
            return "tight"
        if slim:
            return "pksf" if tpu else "slim"
        return None

    def _sampler(self, bucket: int, retry: bool, capacity=None,
                 engine=None):
        key = (bucket, retry, capacity, engine)
        if key not in self._samplers:
            cfg = self.retry_config if retry else self.sampler_config
            if self.use_fast:
                # fast engines compose with a mesh: build_fast_sampler
                # shards the batch over it (per-graph math, no collectives)
                from agdiff_tpu.sampling.langevin import build_fast_sampler

                fast = build_fast_sampler(
                    self.model_config, self.variables, self.diffusion, cfg,
                    use_pallas=False, engine=engine,
                    pair_capacity=capacity,
                    shared_pairs=(engine in _TIGHT_ENGINES
                                  and self._tight_shared),
                    mesh=self.mesh,
                )
                self._samplers[key] = _SamplerHandle(
                    fast, fast=True, fused=self.mesh is None,
                    per_slot_warm=self._per_slot_init)
            elif self.mesh is not None:
                from agdiff_tpu.parallel.data_parallel import make_parallel_sampler

                self._samplers[key] = _SamplerHandle(
                    make_parallel_sampler(
                        self.model, self.diffusion, cfg, self.mesh
                    ),
                    fast=False,
                )
            else:
                self._samplers[key] = _SamplerHandle(
                    build_sampler(self.model, self.diffusion, cfg),
                    fast=False, fused=True,
                    per_slot_warm=self._per_slot_init,
                )
        return self._samplers[key]

    def num_samples_for(self, mol: Molecule, num_confs: str | int = "2x") -> int:
        if isinstance(num_confs, int):
            return num_confs
        if num_confs.endswith("x"):
            return int(num_confs[:-1]) * max(mol.num_ref, 1)
        return int(num_confs)

    def _batch_size_for(self, count: int) -> int:
        """Right-size the padded batch for a final partial chunk: round the
        sample count up to a power of two (>=8) so at most log2(chunk_size)
        programs exist per bucket instead of always paying a full
        chunk_size of wasted ladders (protocol 2x-refs chunks are often
        well under 64). Under a mesh, keep divisibility by device count."""
        if count >= self.chunk_size:
            return self.chunk_size
        b = 8
        while b < count:
            b *= 2
        if self.mesh is not None:
            ndev = int(np.prod(self.mesh.devices.shape))
            b = max(b, ndev)
            b = -(-b // ndev) * ndev
        return min(b, self.chunk_size)

    def _bucket_for(self, mol: Molecule) -> int:
        try:
            return pick_bucket(mol.num_nodes, self.buckets)
        except ValueError:
            # molecule larger than every configured bucket: round up to the
            # next multiple of 8 (a new compiled program, but no failure)
            bucket = (mol.num_nodes + 7) // 8 * 8
            self.buckets = tuple(sorted(set(self.buckets) | {bucket}))
            return bucket

    def _capacity_for(self, mol: Molecule, engine: Optional[str]):
        if engine not in _TIGHT_ENGINES:
            return None
        from agdiff_tpu.models.tight_forward import pair_capacity_for

        # coarse rounding (256) bounds the number of compiled ladder
        # programs across molecule sizes; the tight win comes from
        # capacity << bucket pairs, not exactness
        n = mol.num_nodes
        capacity = pair_capacity_for(n, multiple=256)
        # guard against silent pair truncation (wrong conformers)
        assert capacity >= n * (n - 1) // 2, (capacity, n)
        return capacity

    def warm(self, mol: Molecule, num_samples: Optional[int] = None,
             retry: bool = False, all_sizes: bool = False) -> List[tuple]:
        """AOT-compile every ladder program ``generate_molecule(mol,
        num_samples)`` would run, without executing any of them. The
        persistent generation service (agdiff_tpu.serve) calls this at
        startup so the first request doesn't pay the ladder compile
        (minutes cold, ~1 min with a warm XLA disk cache). retry=True also
        compiles the clip_local retry program. all_sizes=True compiles
        EVERY batch size _batch_size_for can emit (powers of two from 8 up
        to chunk_size) — required under dynamic request batching, where a
        merged burst can land on any of them (a cold merge shape costs
        seconds of compile mid-request otherwise). Returns the
        (bucket, batch_size, retry) programs newly compiled."""
        num_samples = num_samples or self.chunk_size
        bucket = self._bucket_for(mol)
        engine = self._engine_for(bucket)
        capacities = [self._capacity_for(mol, engine)]
        if all_sizes and capacities[0] is not None:
            # Tight-engine programs are ALSO keyed by pair capacity, which
            # is molecule-size-dependent (256-multiples of N(N-1)/2, see
            # _capacity_for). Warming only the probe molecule's capacity
            # leaves same-bucket molecules with other atom counts to
            # compile cold mid-request (measured ~7.6-40 s stalls in the
            # round-4 soak). Enumerate every capacity this bucket can emit:
            # atom counts from just above the previous bucket up to this
            # bucket's size.
            from agdiff_tpu.models.tight_forward import pair_capacity_for

            lo = max((b for b in self.buckets if b < bucket), default=0)
            capacities = sorted({
                pair_capacity_for(n, multiple=256)
                for n in range(lo + 1, bucket + 1)
            })
        sizes = set()
        remaining = num_samples
        while remaining > 0:
            count = min(remaining, self.chunk_size)
            sizes.add(self._batch_size_for(count))
            remaining -= count
        if all_sizes:
            b = 8
            while b < self.chunk_size:
                sizes.add(self._batch_size_for(b))
                b *= 2
            sizes.add(self.chunk_size)
        compiled = []
        for bsz in sorted(sizes):
            batch = pad_molecules([mol] * bsz, bucket, batch_size=bsz)
            if self.mesh is not None:
                from agdiff_tpu.parallel.data_parallel import shard_graph_batch

                batch = shard_graph_batch(batch, self.mesh)
            pos_abs = jax.ShapeDtypeStruct(batch.pos.shape, batch.pos.dtype)
            key_c = jax.random.PRNGKey(0)
            for capacity in capacities:
                for r in ((False, True) if retry else (False,)):
                    sampler = self._sampler(bucket, retry=r,
                                            capacity=capacity,
                                            engine=engine)
                    if sampler.warm(self.variables, batch, pos_abs, key_c):
                        compiled.append((bucket, bsz, r))
        return compiled

    def generate_molecule(
        self, mol: Molecule, num_samples: int, key: jax.Array
    ) -> np.ndarray:
        """Generate num_samples conformers; returns (num_samples, N, 3)."""
        bucket = self._bucket_for(mol)
        n = mol.num_nodes
        out: List[np.ndarray] = []
        remaining = num_samples
        while remaining > 0:
            key, init_key, run_key = _host_keys(
                lambda: jax.random.split(key, 3))
            count = min(remaining, self.chunk_size)
            bsz = self._batch_size_for(count)
            batch = pad_molecules([mol] * bsz, bucket, batch_size=bsz)
            engine = self._engine_for(bucket)
            capacity = self._capacity_for(mol, engine)
            sampler = self._sampler(bucket, retry=False, capacity=capacity,
                                    engine=engine)
            if self.mesh is not None:
                from agdiff_tpu.parallel.data_parallel import shard_graph_batch

                batch = shard_graph_batch(batch, self.mesh)
            if sampler.fused:
                result = sampler.sample(self.variables, batch, init_key,
                                        run_key)
            else:
                pos_init = jax.random.normal(
                    jnp.asarray(init_key), batch.pos.shape)
                result = sampler(self.variables, batch, pos_init, run_key)
            pos, flags = jax.device_get((result.pos, result.nan_flags))
            pos = np.asarray(pos)
            flags = np.asarray(flags)
            if flags.any():
                if self.logger:
                    self.logger.warning(
                        "NaN in %d/%d samples; retrying with clip_local",
                        int(flags.sum()), len(flags),
                    )
                key, retry_key = _host_keys(lambda: jax.random.split(key))
                retry_sampler = self._sampler(bucket, retry=True,
                                              capacity=capacity,
                                              engine=engine)
                if retry_sampler.fused:
                    # same init_key -> the retry regenerates the identical
                    # pos_init inside its program
                    retry = retry_sampler.sample(self.variables, batch,
                                                 init_key, retry_key)
                else:
                    retry = retry_sampler(self.variables, batch, pos_init,
                                          retry_key)
                retry_pos, = jax.device_get((retry.pos,))
                pos = np.where(flags[:, None, None], np.asarray(retry_pos),
                               pos)
            out.append(pos[:count, :n])
            remaining -= count
        return np.concatenate(out, axis=0)

    def run(
        self,
        dataset: Sequence[Molecule],
        out_dir: str,
        seed: int = 0,
        num_confs: str | int = "2x",
        start_idx: int = 0,
        end_idx: Optional[int] = None,
        resume: bool = True,
        save: bool = True,
    ) -> List[Molecule]:
        """Generate for dataset[start_idx:end_idx]; saves incrementally as
        <out_dir>/samples_<i>.npz and a final samples_all.npz (the reference
        writes samples_%d.pkl / samples_all.pkl, test.py:173-195).
        save=False skips every disk write (in-memory serving path: results
        carry pos_gen in meta; resume has nothing to scan)."""
        if save:
            os.makedirs(out_dir, exist_ok=True)
        end_idx = len(dataset) if end_idx is None else min(end_idx, len(dataset))
        results = []
        for i in range(start_idx, end_idx):
            path = os.path.join(out_dir, f"samples_{i}.npz")
            mol = dataset[i]
            if save and resume and os.path.exists(path):
                results.append(load_samples(path)[0])
                continue
            ns = self.num_samples_for(mol, num_confs)
            key = _host_keys(
                lambda: jax.random.fold_in(jax.random.PRNGKey(seed), i))
            pos_gen = self.generate_molecule(mol, ns, key)
            packed = replace(mol, meta={**mol.meta, "pos_gen": pos_gen})
            if save:
                # meta holds pos_gen as a plain array; persist via arrays
                save_mol = Molecule(
                    atom_type=mol.atom_type, pos=mol.pos,
                    bond_index=mol.bond_index, bond_type=mol.bond_type,
                    pos_ref=mol.pos_ref, smiles=mol.smiles,
                    meta={**mol.meta,
                          "__pos_gen_shape__": list(pos_gen.shape)},
                )
                _save_with_gen(path, save_mol, pos_gen)
            if self.logger:
                self.logger.info(
                    "molecule %d: %d samples generated (%d atoms)",
                    i, ns, mol.num_nodes,
                )
            results.append(packed)
        if save:
            _save_all(os.path.join(out_dir, "samples_all.npz"), results)
        return results


def _save_with_gen(path: str, mol: Molecule, pos_gen: np.ndarray) -> None:
    arrs = mol.to_arrays()
    arrs["pos_gen"] = pos_gen.astype(np.float32)
    np.savez_compressed(path, **{f"m0/{k}": v for k, v in arrs.items()},
                        **{"__num__": np.array(1)})


def _save_all(path: str, mols: List[Molecule]) -> None:
    payload = {"__num__": np.array(len(mols))}
    for k, mol in enumerate(mols):
        arrs = mol.to_arrays()
        if "pos_gen" in mol.meta:
            arrs["pos_gen"] = np.asarray(mol.meta["pos_gen"], np.float32)
        for name, arr in arrs.items():
            payload[f"m{k}/{name}"] = arr
    np.savez_compressed(path, **payload)


def load_samples(path: str) -> List[Molecule]:
    """Load samples_all.npz back into packed Molecules with meta['pos_gen']."""
    out = []
    with np.load(path, allow_pickle=False) as data:
        num = int(data["__num__"])
        for k in range(num):
            prefix = f"m{k}/"
            arrs = {
                name[len(prefix):]: data[name]
                for name in data.files if name.startswith(prefix)
            }
            pos_gen = arrs.pop("pos_gen", None)
            mol = Molecule.from_arrays(arrs)
            if pos_gen is not None:
                mol.meta["pos_gen"] = pos_gen
            out.append(mol)
    return out


class PackedGenerationRunner(GenerationRunner):
    """Generation with cross-molecule batch packing.

    The base runner replicates ONE molecule per fixed-size chunk (the
    reference's repeat_data pattern); when a molecule needs fewer samples
    than the chunk, the remainder is wasted compute. This variant greedily
    packs (molecule, sample-count) requests from DIFFERENT molecules of the
    same bucket into shared batches, filling every chunk slot — higher chip
    utilization on real test sets where num_refs varies per molecule.
    Results are identical in distribution (each sample still gets its own
    init noise and PRNG stream keyed by molecule index).

    Tight engine: whenever a bucket selects 'tight' (auto at bucket >= 40,
    or explicit engine='tight'), slots are grouped by (bucket, atom count)
    instead of just bucket — molecules with the same atom count share one
    packed pair list, so every chunk runs the fast SHARED-pair-list layout.
    (The per-graph pair layout was measured SLOWER than fast-xla at N=64 —
    0.85x, B=48 bf16, molecule-sized capacity — because per-graph (B,P,N)
    one-hot aggregation matmuls and gathers dominate; size-homogeneous
    chunks keep the 3.18x shared-engine win instead. Round-3 A/B,
    tools/ab_engines.py --engines fast-xla,fast-tight,fast-tight-pg.)
    Packing only degrades when atom counts are very diverse AND per-size
    sample counts are small — then partial chunks appear per size class;
    _batch_size_for right-sizes them."""

    # size-homogeneous grouping (run()) makes shared pair lists valid
    _tight_shared = True
    # fused-init dispatch draws one noise tensor PER SLOT (each sample has
    # its own PRNG stream keyed by molecule index)
    _per_slot_init = True

    def run(self, dataset, out_dir, seed=0, num_confs="2x", start_idx=0,
            end_idx=None, resume=True, save=True, item_seeds=None):
        """num_confs may be a per-item list of sample counts (the serve
        layer's dynamic batching merges requests with different counts).
        item_seeds, when given, is a per-item (seed, index) list: item j's
        sample k draws init noise from fold_in(fold_in(PRNGKey(seed), index),
        k) — so a request's samples are a pure function of ITS seed and
        molecule positions, independent of whatever other requests it was
        co-batched with."""
        if save:
            os.makedirs(out_dir, exist_ok=True)
        end_idx = len(dataset) if end_idx is None else min(end_idx, len(dataset))
        per_item_confs = isinstance(num_confs, (list, tuple))
        if item_seeds is not None:
            assert len(item_seeds) == len(dataset), (len(item_seeds),
                                                     len(dataset))
        todo = []   # (dataset_idx, mol, num_samples)
        results: Dict[int, Molecule] = {}
        for i in range(start_idx, end_idx):
            path = os.path.join(out_dir, f"samples_{i}.npz")
            mol = dataset[i]
            if save and resume and os.path.exists(path):
                results[i] = load_samples(path)[0]
                continue
            ns = (int(num_confs[i]) if per_item_confs
                  else self.num_samples_for(mol, num_confs))
            todo.append((i, mol, ns))

        # group by bucket — and by atom count too when the bucket selects
        # the tight engine, so every chunk is size-homogeneous and the fast
        # SHARED pair-list layout applies (see class docstring)
        by_group: Dict[tuple, list] = {}
        for i, mol, ns in todo:
            bucket = self._bucket_for(mol)
            size = (mol.num_nodes
                    if self._engine_for(bucket) in _TIGHT_ENGINES
                    else None)
            by_group.setdefault((bucket, size), []).append((i, mol, ns))

        collected: Dict[int, list] = {i: [] for i, _, _ in todo}
        chunk_no = 0  # global counter -> unique ladder-noise key per chunk
        for (bucket, _size), items in by_group.items():
            engine = self._engine_for(bucket)
            capacity = self._capacity_for(items[0][1], engine)
            # expand into per-sample slots: (dataset_idx, mol, sample_idx)
            slots = [
                (i, mol, k)
                for i, mol, ns in items
                for k in range(ns)
            ]
            for start in range(0, len(slots), self.chunk_size):
                chunk = slots[start:start + self.chunk_size]
                mols = [mol for _, mol, _ in chunk]
                bsz = self._batch_size_for(len(chunk))
                pad_count = bsz - len(chunk)
                batch = pad_molecules(
                    mols + [mols[-1]] * pad_count, bucket, batch_size=bsz,
                )
                # per-slot init noise keyed by (seed, dataset_idx,
                # sample_idx); key math on the host CPU backend (one
                # vectorized op, not B remote dispatches)
                if item_seeds is None:
                    sds = np.array([seed] * len(chunk) + [0] * pad_count,
                                   np.uint32)
                    idx = np.array([i for i, _, _ in chunk]
                                   + [0] * pad_count, np.uint32)
                else:
                    sds = np.array([item_seeds[i][0] for i, _, _ in chunk]
                                   + [0] * pad_count, np.uint32)
                    idx = np.array([item_seeds[i][1] for i, _, _ in chunk]
                                   + [0] * pad_count, np.uint32)
                sam = np.array([k for _, _, k in chunk]
                               + [0] * pad_count, np.uint32)
                real = np.array([True] * len(chunk) + [False] * pad_count)

                def _chunk_keys():
                    base = jax.vmap(
                        lambda s_, i_, k_: jax.random.fold_in(
                            jax.random.fold_in(
                                jax.random.PRNGKey(s_), i_), k_)
                    )(jnp.asarray(sds), jnp.asarray(idx), jnp.asarray(sam))
                    pad_key = jnp.broadcast_to(jax.random.PRNGKey(0),
                                               base.shape)
                    keys = jnp.where(real[:, None], base, pad_key)
                    run_key = jax.random.fold_in(
                        jax.random.PRNGKey(seed ^ 0x5EED), chunk_no)
                    return keys, run_key

                keys, run_key = _host_keys(_chunk_keys)
                chunk_no += 1
                sampler = self._sampler(bucket, retry=False,
                                        capacity=capacity, engine=engine)
                if sampler.fused:
                    result = sampler.sample(self.variables, batch, keys,
                                            run_key)
                else:
                    pos_init = jax.vmap(
                        lambda kk: jax.random.normal(
                            kk, (batch.max_nodes, 3))
                    )(jnp.asarray(keys))
                    result = sampler(self.variables, batch, pos_init,
                                     run_key)
                pos, flags = jax.device_get((result.pos, result.nan_flags))
                pos = np.asarray(pos)
                flags = np.asarray(flags)
                if flags.any():
                    retry_key = _host_keys(
                        lambda: jax.random.fold_in(jnp.asarray(run_key), 1))
                    retry_sampler = self._sampler(bucket, retry=True,
                                                  capacity=capacity,
                                                  engine=engine)
                    if retry_sampler.fused:
                        retry = retry_sampler.sample(self.variables, batch,
                                                     keys, retry_key)
                    else:
                        retry = retry_sampler(self.variables, batch,
                                              pos_init, retry_key)
                    retry_pos, = jax.device_get((retry.pos,))
                    pos = np.where(flags[:, None, None],
                                   np.asarray(retry_pos), pos)
                for slot, (i, mol, k) in enumerate(chunk):
                    collected[i].append(pos[slot, : mol.num_nodes])

        for i, mol, ns in todo:
            pos_gen = np.stack(collected[i], axis=0)
            packed = replace(mol, meta={**mol.meta, "pos_gen": pos_gen})
            if save:
                _save_with_gen(
                    os.path.join(out_dir, f"samples_{i}.npz"),
                    Molecule(atom_type=mol.atom_type, pos=mol.pos,
                             bond_index=mol.bond_index,
                             bond_type=mol.bond_type,
                             pos_ref=mol.pos_ref, smiles=mol.smiles,
                             meta=dict(mol.meta)),
                    pos_gen,
                )
            results[i] = packed
            if self.logger:
                self.logger.info("molecule %d: %d samples (packed batches)",
                                 i, ns)
        ordered = [results[i] for i in sorted(results)]
        if save:
            _save_all(os.path.join(out_dir, "samples_all.npz"), ordered)
        return ordered
