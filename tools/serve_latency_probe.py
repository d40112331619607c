"""Client-side serving latency probe.

Stands against a running agdiff_tpu server and measures REQUEST wall-clock
from the client (what a user actually waits), not server-internal seconds:

  sequential mode: N identical requests one after another -> per-request
  latency distribution (first = compile/warm, rest = steady state);
  concurrent mode: K threads fire the same request simultaneously -> total
  wall + per-request latency under a --batch_window server (dynamic
  batching merges them into one packed run).

Usage:
  python tools/serve_latency_probe.py --port 7531 --requests 8
  python tools/serve_latency_probe.py --port 7531 --concurrent 8

The request shape matches tools/serve_distilled_bench.sh (2 rich molecules
x 4 samples) so numbers are comparable with the round-3 README table
(teacher@5000: 2.3 s/req; distilled n16 pre-fused-dispatch: 0.145 s/req).
"""

import argparse
import json
import threading
import time

from agdiff_tpu.serve.server import submit
import sys

sys.path.insert(0, "/root/repo")


def _request(seed: int, args) -> dict:
    req = {
        "cmd": "generate", "synthetic": args.mols,
        "synthetic_chem": args.chem,
        "num_confs": args.num_confs, "seed": seed, "resume": False,
        "save": False, "return_pos": False,
    }
    if args.heavy:
        req["synthetic_heavy"] = args.heavy
    if args.return_pos:
        req["return_pos"] = True
    return req


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7531)
    ap.add_argument("--requests", type=int, default=8,
                    help="sequential requests to time")
    ap.add_argument("--concurrent", type=int, default=0,
                    help="fire this many concurrent requests instead")
    ap.add_argument("--return_pos", action="store_true",
                    help="inline conformers in the reply (adds JSON cost)")
    ap.add_argument("--seed0", type=int, default=2021)
    ap.add_argument("--mols", type=int, default=2,
                    help="synthetic molecules per request")
    ap.add_argument("--num_confs", type=int, default=4)
    ap.add_argument("--chem", default="rich", choices=["tree", "rich"])
    ap.add_argument("--heavy", type=int, default=0,
                    help="synthetic_heavy size class (0 = server default; "
                         "9 = QM9-size, 20 = Drugs-size)")
    args = ap.parse_args()

    if args.concurrent:
        lat = [None] * args.concurrent
        replies = [None] * args.concurrent

        def _client(j):
            t0 = time.time()
            replies[j] = submit(
                _request(args.seed0 + j, args),
                host=args.host, port=args.port, timeout=600)
            lat[j] = time.time() - t0

        t0 = time.time()
        threads = [threading.Thread(target=_client, args=(j,))
                   for j in range(args.concurrent)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        ok = sum(1 for r in replies if r and r.get("ok"))
        batched = max((r.get("batched_with", 0) for r in replies if r),
                      default=0)
        samples = sum(r.get("samples", 0) for r in replies if r)
        print(json.dumps({
            "mode": "concurrent", "clients": args.concurrent, "ok": ok,
            "wall_s": round(wall, 3),
            "per_request_s": [round(x, 3) for x in lat],
            "max_batched_with": batched,
            "samples_total": samples,
            "samples_per_s": round(samples / wall, 1),
        }))
        return

    lat, samples = [], []
    for j in range(args.requests):
        t0 = time.time()
        r = submit(_request(args.seed0 + j, args),
                   host=args.host, port=args.port, timeout=1200)
        dt = time.time() - t0
        assert r.get("ok"), r
        lat.append(dt)
        samples.append(r.get("samples", 0))
        print(f"request {j}: {dt:.3f} s ({r.get('samples')} samples)")
    steady = lat[1:] if len(lat) > 1 else lat
    steady_samples = samples[1:] if len(samples) > 1 else samples
    print(json.dumps({
        "mode": "sequential", "requests": args.requests,
        "first_s": round(lat[0], 3),
        "steady_mean_s": round(sum(steady) / len(steady), 4),
        "steady_min_s": round(min(steady), 4),
        "samples_per_s_steady": round(
            sum(steady_samples) / sum(steady), 1),
    }))


if __name__ == "__main__":
    main()
