"""Persistent generation service.

The reference's generation entry point is a one-shot script (reference:
scripts/test.py:124-195) — every invocation pays model load plus the
Langevin-ladder XLA compile (minutes cold, ~1 min with a warm disk cache;
the ladder itself is seconds). This service loads the checkpoint ONCE,
AOT-pre-warms the bucket ladder programs (GenerationRunner.warm), and then
answers generation requests over a TCP socket, reusing the compiled-sampler
cache across requests — request latency drops to the ladder wall-clock.

Protocol: newline-delimited JSON, one request per connection:

  {"cmd": "ping"}
  {"cmd": "warm", "nodes": [24, 48], "num_samples": 64, "retry": false}
  {"cmd": "generate", "test_set": "mols.npz", "out_dir": "out",
   "num_confs": "2x", "seed": 2021, "start_idx": 0, "end_idx": null,
   "resume": true}
  {"cmd": "generate", "synthetic": 8, "synthetic_seed": 7,
   "synthetic_chem": "rich", "out_dir": "out"}
  {"cmd": "shutdown"}

Replies are one JSON line, always with an "ok" field. Request handling is
single-threaded by design: one chip serializes ladder programs anyway, and
share-nothing requests keep the failure story trivial (a failed request
reports its traceback string; the server keeps serving).

Dynamic batching (batch_window_s > 0, requires a PackedGenerationRunner):
concurrent "generate" requests arriving within the window are merged into
ONE packed run — their molecules share chunk slots, so K small requests
cost ~the ladder wall-clock of one batched run instead of K dispatches of
mostly-padding chunks. Per-request PRNG (item_seeds) keeps every request's
samples a pure function of its own seed — co-batching never changes
results. A request can opt out with "batch": false.
"""

from __future__ import annotations

import json
import queue as queue_mod
import socket
import threading
import time
import traceback
from typing import Optional

import numpy as np

from agdiff_tpu.chem.constants import BondType
from agdiff_tpu.chem.mol import Molecule


class OverCapacityError(ValueError):
    """Request asked for a molecule larger than the server's --max_nodes.

    A DESIGNED rejection, not a failure: replies carry
    ``rejected: "over_capacity"`` and a one-line message instead of a
    traceback, so clients (and the soak harness) can tell policy
    rejections from genuine server errors."""


def _reject_reply(exc: OverCapacityError) -> dict:
    return {"ok": False, "error": str(exc), "rejected": "over_capacity"}


def probe_molecule(num_nodes: int) -> Molecule:
    """A linear carbon chain of `num_nodes` atoms: the cheapest molecule
    that exercises the (bucket, batch) shapes and the tight engine's pair
    capacity for a given size class. Compiled programs depend only on
    shapes, so warming with a probe covers every real molecule that maps
    to the same bucket."""
    n = max(int(num_nodes), 2)
    pos = np.zeros((n, 3), np.float32)
    pos[:, 0] = np.arange(n) * 1.52
    pos -= pos.mean(0, keepdims=True)
    src = np.repeat(np.arange(n - 1), 2)
    dst = src.copy()
    src[0::2] = np.arange(n - 1)
    dst[0::2] = np.arange(1, n)
    src[1::2] = np.arange(1, n)
    dst[1::2] = np.arange(n - 1)
    return Molecule(
        atom_type=np.full((n,), 6, np.int32),
        pos=pos,
        bond_index=np.stack([src, dst]).astype(np.int32),
        bond_type=np.full((2 * (n - 1),), int(BondType.SINGLE), np.int32),
        smiles=f"PROBE-{n}",
    )


def warm_classes(runner, molecules) -> dict:
    """Group molecules into the (bucket, tight-capacity) classes whose
    ladder programs `runner` would compile, keeping the largest molecule
    of each class as the warm-up representative (it pins the capacity).
    Used by `cli.serve --warm_set`."""
    classes: dict = {}
    for m in molecules:
        b = runner._bucket_for(m)
        cap = runner._capacity_for(m, runner._engine_for(b))
        prev = classes.get((b, cap))
        if prev is None or m.num_nodes > prev.num_nodes:
            classes[(b, cap)] = m
    return classes


class GenerationService:
    """Request handler around a (pre-built) GenerationRunner."""

    def __init__(self, runner, logger=None, batch_window_s: float = 0.0,
                 max_nodes: Optional[int] = None):
        self.runner = runner
        self.logger = logger
        self.started = time.time()
        self.requests = 0
        self.batch_window_s = float(batch_window_s)
        # capacity guard: a molecule larger than every warmed bucket would
        # otherwise compile a NEW ladder program mid-request (~7.6 s stall
        # even with a warm disk cache) and, for the tight engine, risks the
        # silent pair-truncation hazard (sampling/langevin.py build_fast_
        # sampler docstring). With max_nodes set, over-capacity requests
        # are REJECTED cleanly ({"ok": false, "error": "..."}) before any
        # device work; co-batched requests are unaffected (validation runs
        # per-request inside _load_dataset).
        self.max_nodes = int(max_nodes) if max_nodes else None
        # cross-request packing needs the packed runner's per-item seeds
        # and per-item sample counts (run(num_confs=list, item_seeds=...))
        if self.batch_window_s > 0 and not getattr(runner, "_per_slot_init",
                                                   False):
            raise ValueError(
                "dynamic batching requires a PackedGenerationRunner "
                "(cli.serve: pass --packed with --batch_window)")
        self._queue: queue_mod.Queue = queue_mod.Queue()
        self._worker: Optional[threading.Thread] = None

    # ---- request handlers ----

    def handle(self, request: dict) -> dict:
        cmd = request.get("cmd")
        self.requests += 1
        try:
            if cmd == "ping":
                return self._ping()
            if cmd == "warm":
                return self._warm(request)
            if cmd == "generate":
                return self._generate(request)
            if cmd == "evaluate":
                return self._evaluate(request)
            if cmd == "shutdown":
                return {"ok": True, "shutdown": True}
            return {"ok": False, "error": f"unknown cmd: {cmd!r}"}
        except OverCapacityError as e:
            return _reject_reply(e)
        except Exception:
            return {"ok": False, "error": traceback.format_exc()}

    def _ping(self) -> dict:
        programs = sum(
            max(1, len(h.compiled))
            for h in self.runner._samplers.values()
        )
        return {
            "ok": True,
            "uptime_s": round(time.time() - self.started, 3),
            "requests": self.requests,
            "cached_programs": programs,
            "buckets": list(self.runner.buckets),
        }

    def _warm(self, request: dict) -> dict:
        t0 = time.time()
        compiled = []
        for n in request.get("nodes", []):
            compiled += self.runner.warm(
                probe_molecule(int(n)),
                num_samples=request.get("num_samples"),
                retry=bool(request.get("retry", False)),
                # under dynamic batching a merged burst can land on any
                # power-of-two batch size; warm them all by default
                all_sizes=bool(request.get(
                    "all_sizes", self.batch_window_s > 0)),
            )
        return {
            "ok": True,
            "compiled": [list(c) for c in compiled],
            "seconds": round(time.time() - t0, 3),
        }

    def _check_capacity(self, molecules):
        """Reject over-capacity molecules cleanly (see __init__)."""
        if self.max_nodes is None:
            return molecules
        for m in molecules:
            if m.num_nodes > self.max_nodes:
                raise OverCapacityError(
                    f"molecule {getattr(m, 'smiles', '?')!r} has "
                    f"{m.num_nodes} atoms > server capacity "
                    f"{self.max_nodes} (serve --max_nodes); request "
                    "rejected — start a server warmed for larger buckets")
        return molecules

    def _load_dataset(self, request: dict):
        if request.get("test_set"):
            from agdiff_tpu.data.dataset import PackedConformationDataset

            return self._check_capacity(
                PackedConformationDataset(request["test_set"]).molecules)
        if request.get("synthetic"):
            from agdiff_tpu.data.synthetic import heavy_range, synthetic_dataset

            kw = {}
            if request.get("synthetic_heavy") is not None:
                lo, hi = heavy_range(int(request["synthetic_heavy"]))
                kw = dict(min_heavy=lo, max_heavy=hi)
            return self._check_capacity(synthetic_dataset(
                int(request["synthetic"]),
                seed=int(request.get("synthetic_seed", 7)),
                num_conformers=int(request.get("num_conformers", 3)),
                chem=request.get("synthetic_chem", "tree"),
                **kw,
            ))
        raise ValueError("generate needs 'test_set' or 'synthetic'")

    def _generate(self, request: dict) -> dict:
        """save=false keeps the request entirely in memory (no npz writes;
        latency path for interactive serving); return_pos=true inlines the
        generated conformers in the reply as nested lists
        (pos[mol][sample][atom][xyz], float32 precision)."""
        save = bool(request.get("save", True))
        return_pos = bool(request.get("return_pos", False))
        out_dir = request.get("out_dir")
        if not out_dir:
            if save:
                raise ValueError("generate needs 'out_dir' (or 'save': false)")
            out_dir = "."
        dataset = self._load_dataset(request)
        t0 = time.time()
        results = self.runner.run(
            dataset,
            out_dir,
            seed=int(request.get("seed", 2021)),
            num_confs=request.get("num_confs", "2x"),
            start_idx=int(request.get("start_idx", 0)),
            end_idx=request.get("end_idx"),
            resume=bool(request.get("resume", True)),
            save=save,
        )
        dt = time.time() - t0
        n_samples = sum(
            int(np.asarray(m.meta["pos_gen"]).shape[0])
            for m in results if "pos_gen" in m.meta
        )
        reply = {
            "ok": True,
            "molecules": len(results),
            "samples": n_samples,
            "seconds": round(dt, 3),
        }
        if save:
            reply["out"] = f"{out_dir}/samples_all.npz"
        if return_pos:
            reply["pos"] = [
                np.asarray(m.meta["pos_gen"], np.float32).tolist()
                for m in results
            ]
        return reply

    def _evaluate(self, request: dict) -> dict:
        """COV/MAT over a generated samples npz (the generate reply's
        "out" path feeds straight in): {"cmd": "evaluate",
        "samples": ".../samples_all.npz", "ratio": 2}."""
        from agdiff_tpu.eval.covmat import CovMatEvaluator
        from agdiff_tpu.eval.generate import load_samples

        path = request.get("samples")
        if not path:
            raise ValueError("evaluate needs 'samples'")
        data_list = load_samples(path)
        evaluator = CovMatEvaluator(
            num_workers=int(request.get("num_workers", 8)),
            ratio=int(request.get("ratio", 2)),
        )
        t0 = time.time()
        results = evaluator(data_list,
                            start_idx=int(request.get("start_idx", 0)))
        # MAT-* are per-molecule scalars; COV-* reported at the reference's
        # headline thresholds (QM9 0.5 A / Drugs 1.25 A index by nearest)
        stats = {
            "MAT-R_mean": float(np.mean(results.MatchingR)),
            "MAT-P_mean": float(np.mean(results.MatchingP)),
        }
        for thr in (0.5, 1.25):
            k = int(np.argmin(np.abs(results.thresholds - thr)))
            stats[f"COV-R_mean@{thr}"] = float(
                np.mean(results.CoverageR[:, k]))
            stats[f"COV-P_mean@{thr}"] = float(
                np.mean(results.CoverageP[:, k]))
        return {
            "ok": True,
            "molecules": len(data_list),
            "seconds": round(time.time() - t0, 3),
            **{k: round(v, 4) for k, v in stats.items()},
        }

    # ---- dynamic batching ----

    def _batch_worker(self) -> None:
        """Drains the request queue: waits for one generate request, keeps
        collecting for batch_window_s, then runs the merged batch. Exits on
        the (None, None) sentinel (after flushing what's queued)."""
        stop = False
        while not stop:
            item = self._queue.get()
            if item[0] is None:
                break
            pending = [item]
            deadline = time.time() + self.batch_window_s
            while True:
                t = deadline - time.time()
                if t <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=t)
                except queue_mod.Empty:
                    break
                if nxt[0] is None:
                    stop = True
                    break
                pending.append(nxt)
            self._run_merged(pending)

    def _run_merged(self, pending) -> None:
        """One packed run over every pending request's molecules. Requests
        are ordered by seed so batch composition (and thus the chunk-level
        ladder noise) is deterministic for a given request set; each
        request's init noise is keyed by ITS (seed, molecule-index) via
        item_seeds, so its samples don't depend on co-batched traffic."""
        order = sorted(range(len(pending)),
                       key=lambda j: int(pending[j][1].get("seed", 2021)))
        mols, confs, item_seeds, owners = [], [], [], []
        for j in order:
            conn, req = pending[j]
            try:
                dataset = self._load_dataset(req)
            except OverCapacityError as e:
                self._send(conn, _reject_reply(e))
                conn.close()
                continue
            except Exception:
                self._send(conn, {"ok": False,
                                  "error": traceback.format_exc()})
                conn.close()
                continue
            seed = int(req.get("seed", 2021))
            start = len(mols)
            for k, m in enumerate(dataset):
                mols.append(m)
                confs.append(self.runner.num_samples_for(
                    m, req.get("num_confs", "2x")))
                item_seeds.append((seed, k))
            owners.append((conn, req, start, len(dataset)))
        if not mols:
            return
        self.requests += len(owners)
        t0 = time.time()
        try:
            results = self.runner.run(
                mols, ".", num_confs=confs, item_seeds=item_seeds,
                save=False, resume=False,
            )
        except Exception:
            err = {"ok": False, "error": traceback.format_exc()}
            for conn, _, _, _ in owners:
                self._send(conn, err)
                conn.close()
            return
        dt = time.time() - t0
        for conn, req, start, count in owners:
            try:
                sub = results[start:start + count]
                reply = {
                    "ok": True,
                    "molecules": count,
                    "samples": int(sum(
                        np.asarray(m.meta["pos_gen"]).shape[0]
                        for m in sub)),
                    "seconds": round(dt, 3),
                    "batched_with": len(owners) - 1,
                }
                out_dir = req.get("out_dir")
                if bool(req.get("save", True)) and out_dir:
                    import os as _os

                    from agdiff_tpu.eval.generate import (
                        _save_all,
                        _save_with_gen,
                    )

                    _os.makedirs(out_dir, exist_ok=True)
                    for k, m in enumerate(sub):
                        _save_with_gen(
                            _os.path.join(out_dir, f"samples_{k}.npz"),
                            m, np.asarray(m.meta["pos_gen"], np.float32))
                    _save_all(_os.path.join(out_dir, "samples_all.npz"),
                              sub)
                    reply["out"] = f"{out_dir}/samples_all.npz"
                if bool(req.get("return_pos", False)):
                    reply["pos"] = [
                        np.asarray(m.meta["pos_gen"], np.float32).tolist()
                        for m in sub
                    ]
            except Exception:
                reply = {"ok": False, "error": traceback.format_exc()}
            self._send(conn, reply)
            conn.close()

    # ---- transport ----

    def serve(self, host: str = "127.0.0.1", port: int = 0,
              ready_callback=None) -> None:
        """Blocking accept loop; one JSON-line request per connection.
        ready_callback(bound_port) fires once listening (port=0 binds an
        ephemeral port — the callback is how tests learn it)."""
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((host, port))
        srv.listen(8)
        bound = srv.getsockname()[1]
        if self.logger:
            self.logger.info("serving on %s:%d", host, bound)
        if self.batch_window_s > 0:
            self._worker = threading.Thread(target=self._batch_worker,
                                            daemon=True)
            self._worker.start()
        if ready_callback:
            ready_callback(bound)
        try:
            while True:
                conn, _ = srv.accept()
                request, bad = self._read_request(conn)
                if bad is not None:
                    self._send(conn, bad)
                    conn.close()
                    continue
                if (self.batch_window_s > 0
                        and request.get("cmd") == "generate"
                        and bool(request.get("batch", True))):
                    self._queue.put((conn, request))  # worker replies
                    continue
                reply = self.handle(request)
                self._send(conn, reply)
                conn.close()
                if reply.get("shutdown"):
                    break
        finally:
            if self._worker is not None:
                self._queue.put((None, None))
                self._worker.join(timeout=600)
            srv.close()

    def _read_request(self, conn):
        """Returns (request, None) or (None, error_reply)."""
        data = b""
        conn.settimeout(60.0)
        try:
            while not data.endswith(b"\n"):
                chunk = conn.recv(1 << 16)
                if not chunk:
                    break
                data += chunk
            request = json.loads(data.decode() or "{}")
        except json.JSONDecodeError as e:
            return None, {"ok": False, "error": f"bad json: {e}"}
        except OSError as e:
            return None, {"ok": False, "error": f"recv failed: {e}"}
        return request, None

    def _send(self, conn, reply: dict) -> None:
        try:
            conn.sendall((json.dumps(reply) + "\n").encode())
        except OSError:
            # client hung up while we were generating; the work is saved
            # on disk either way — keep serving
            if self.logger:
                self.logger.warning("client disconnected before reply")


def submit(request: dict, host: str = "127.0.0.1", port: int = 7521,
           timeout: Optional[float] = None) -> dict:
    """Client: send one request, return the parsed reply."""
    with socket.create_connection((host, port), timeout=timeout) as conn:
        conn.sendall((json.dumps(request) + "\n").encode())
        data = b""
        while not data.endswith(b"\n"):
            chunk = conn.recv(1 << 16)
            if not chunk:
                break
            data += chunk
    return json.loads(data.decode())
