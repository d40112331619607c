"""Serving soak test: a sustained, distributional workload against the
generation service (VERDICT r3 #7).

Round 3 measured 415 conf/s on ONE homogeneous 8-client burst; a serving
claim needs a sustained mixed workload. This tool runs N concurrent client
threads for --duration seconds against a cli.serve server; each request
draws a random molecule size class and a random num_confs, so dynamic
batching constantly merges heterogeneous requests. Reports per-class and
overall p50/p99 latency, served conf/s, and the error count (must be 0),
then probes the over-capacity path (must reject cleanly with ok:false when
the server was started with --max_nodes).

Spawn a server first (TPU example, distilled n16 student):
  python -m agdiff_tpu.cli.serve <ckpt> --fast --packed --port 7521 \
      --sampling_type generalized --ladder strided --n_steps 16 --eta 0 \
      --batch_window 0.05 --warm_nodes 24,48 --max_nodes 48
then:
  python tools/serve_soak.py --port 7521 --clients 8 --duration 60 \
      --sizes 9,20 --capacity 48

Each size class is a synthetic_heavy value (9 = QM9-size ~24 atoms,
20 = Drugs-size ~48 atoms). Requests are in-memory (save=false) so the
measurement is serving latency, not disk IO.
"""

import argparse
import json
import random
import threading
import time

import sys

sys.path.insert(0, "/root/repo")

from agdiff_tpu.serve.server import submit  # noqa: E402


def percentile(xs, q):
    xs = sorted(xs)
    if not xs:
        return float("nan")
    k = min(len(xs) - 1, max(0, int(round(q / 100.0 * (len(xs) - 1)))))
    return xs[k]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7521)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--sizes", default="9,20",
                    help="comma list of synthetic_heavy size classes")
    ap.add_argument("--confs", default="2,4,8",
                    help="comma list num_confs values to draw from")
    ap.add_argument("--mols", type=int, default=2,
                    help="molecules per request")
    ap.add_argument("--capacity", type=int, default=0,
                    help="server --max_nodes; if > 0, finish with an "
                         "over-capacity probe that must reject cleanly")
    ap.add_argument("--timeout", type=float, default=600.0)
    args = ap.parse_args()

    sizes = [int(s) for s in args.sizes.split(",") if s]
    confs = [int(c) for c in args.confs.split(",") if c]

    ping = submit({"cmd": "ping"}, args.host, args.port, timeout=30)
    assert ping.get("ok"), ping
    print("server up:", json.dumps(ping))

    lock = threading.Lock()
    records = []   # (size_class, latency_s, samples, ok, batched_with)
    with_rejects = []  # (size_class, latency_s): clean over-capacity
    errors = []
    stop_at = time.time() + args.duration

    def client(cid):
        rng = random.Random(1000 + cid)
        k = 0
        while time.time() < stop_at:
            k += 1
            heavy = rng.choice(sizes)
            nc = rng.choice(confs)
            req = {
                "cmd": "generate", "synthetic": args.mols,
                "synthetic_seed": rng.randrange(1 << 16),
                "synthetic_heavy": heavy, "num_confs": nc,
                "seed": cid * 100000 + k, "save": False, "resume": False,
            }
            t0 = time.time()
            try:
                r = submit(req, args.host, args.port, timeout=args.timeout)
            except Exception as e:  # transport failure = error
                with lock:
                    errors.append(f"client{cid}: {e!r}")
                continue
            dt = time.time() - t0
            with lock:
                if r.get("ok"):
                    records.append((heavy, dt, r.get("samples", 0),
                                    r.get("batched_with", 0)))
                elif r.get("rejected") == "over_capacity":
                    # designed policy rejection (molecule > --max_nodes):
                    # count separately — the soak draws random molecules,
                    # some legitimately exceed the server's capacity class
                    with_rejects.append((heavy, dt))
                else:
                    errors.append(f"client{cid}: {r.get('error', '?')[:400]}")

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    t_start = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t_start

    total_samples = sum(r[2] for r in records)
    out = {
        "clients": args.clients,
        "wall_s": round(wall, 1),
        "requests_ok": len(records),
        "rejected_over_capacity": len(with_rejects),
        "reject_p50_s": round(
            percentile([r[1] for r in with_rejects], 50), 3),
        "errors": len(errors),
        "conf_per_sec_served": round(total_samples / wall, 1),
        "samples_total": total_samples,
        "mean_batched_with": round(
            sum(r[3] for r in records) / max(1, len(records)), 2),
        "per_class": {},
    }
    for heavy in sizes:
        lats = [r[1] for r in records if r[0] == heavy]
        out["per_class"][str(heavy)] = {
            "requests": len(lats),
            "p50_s": round(percentile(lats, 50), 3),
            "p99_s": round(percentile(lats, 99), 3),
            "max_s": round(max(lats), 3) if lats else None,
        }
    print(json.dumps(out))
    for e in errors[:5]:
        print("ERROR:", e)

    if args.capacity:
        probe = submit({
            "cmd": "generate", "synthetic": 1, "synthetic_seed": 3,
            "synthetic_heavy": 40, "num_confs": 2, "save": False,
        }, args.host, args.port, timeout=args.timeout)
        ok = (probe.get("ok") is False
              and probe.get("rejected") == "over_capacity"
              and f"server capacity {args.capacity}" in probe.get("error", ""))
        print("over_capacity_probe:",
              "CLEAN_REJECT" if ok else f"UNEXPECTED: {probe}")
        if not ok:
            return 1
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
