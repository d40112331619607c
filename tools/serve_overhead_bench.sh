#!/bin/bash
# Serving overhead A/B (round 3, after the fused-dispatch work).
#
# Round-3 baseline (tools/serve_distilled_bench.sh, same request shape:
# 2 rich molecules x 4 samples): distilled n16 student served 0.145
# s/request — all overhead (remote dispatch round-trips + host batch prep
# + npz writes), not ladder compute. This script re-measures with the
# overhead levers in: fused-init dispatch (1 round-trip per chunk),
# in-memory requests (save:false), and dynamic batching under 8
# concurrent clients (--batch_window on a packed runner).
#
# Usage: serve_overhead_bench.sh [student_ckpt_dir]
#   (default .rehearsals/distillC/stage16 — the arm-M n16 student)
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
R=/root/repo/.rehearsals
STUDENT=${1:-$R/distillC/stage16}
[ -d "$STUDENT" ] || { echo NO_STUDENT; exit 1; }
PORT=7533

run_probe () {  # name extra-server-flags...
  local name=$1; shift
  python -m agdiff_tpu.cli.serve "$STUDENT" --port $PORT --fast \
    --n_steps 16 --ladder strided --sampling_type generalized --eta 0 \
    --w_global 0.3 --clip_local 20 "$@" \
    > "$R/serveov_$name.log" 2>&1 &
  echo $! > /tmp/serveov.pid
  local i
  for i in $(seq 1 150); do
    sleep 4
    python -m agdiff_tpu.cli.serve --port $PORT --submit '{"cmd": "ping"}' \
      > /dev/null 2>&1 && break
  done
  # warm request pays the ladder compile; then the timed probes
  python -m agdiff_tpu.cli.serve --port $PORT --submit \
    '{"cmd": "generate", "synthetic": 2, "synthetic_chem": "rich",
      "num_confs": 4, "seed": 1, "save": false}' > /dev/null 2>&1
  python /root/repo/tools/serve_latency_probe.py --port $PORT --requests 8 \
    | tee "$R/serveov_${name}_seq.json"
  # two concurrent bursts: the first may pay one-time costs (e.g. a merge
  # shape never warmed), the second is steady state
  python /root/repo/tools/serve_latency_probe.py --port $PORT --concurrent 8 \
    | tee "$R/serveov_${name}_conc.json"
  python /root/repo/tools/serve_latency_probe.py --port $PORT --concurrent 8 \
    | tee "$R/serveov_${name}_conc2.json"
  python -m agdiff_tpu.cli.serve --port $PORT --submit \
    '{"cmd": "shutdown"}' > /dev/null 2>&1
  sleep 3
  kill "$(cat /tmp/serveov.pid)" 2>/dev/null
  true
}

# single-request latency path (unbatched runner, fused dispatch + no disk)
run_probe fused
# concurrent-client path: packed runner + dynamic batching window;
# --warm_nodes pre-compiles EVERY power-of-two merge shape for the probe
# molecules' bucket (a cold merge shape costs seconds mid-request)
run_probe batched --packed --batch_window 0.05 --warm_nodes 32

echo === fused ===;   cat "$R"/serveov_fused_{seq,conc,conc2}.json
echo === batched ===; cat "$R"/serveov_batched_{seq,conc,conc2}.json
echo SERVE_OVERHEAD_DONE
