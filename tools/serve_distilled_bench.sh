#!/bin/bash
# Serving latency with a progressive-distillation student (round 3).
#
# The README's serve numbers (72 s startup, then 6.9 s / 2.4 s per request)
# are for the full 5000-step protocol ladder. Arm M showed the distilled
# n16 student is statistical parity with that protocol at 312x fewer NFE —
# this script measures what that buys a serving deployment: distill the
# r3c teacher down to 16 steps, stand up cli.serve with the few-step DDIM
# flags, and time identical requests (2 molecules x 4 samples, rich
# chemistry) against both the teacher@5000 and student@16 servers.
#
# Usage: serve_distilled_bench.sh [teacher_ckpt]   (defaults to the r3c
# teacher's best checkpoint; retry-safe: distill stages resume/skip)
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
R=/root/repo/.rehearsals
if [ -n "$1" ]; then TEACHER=$1; else
  LOGDIR=$(ls -d "$R"/armG/logs/cfg_* | tail -1)
  TEACHER=$(cat "$LOGDIR/best_model/POINTER")
fi
echo "TEACHER=$TEACHER"

# --- distill 64 -> 32 -> 16 (the n8 stage isn't needed here) ---
python -m agdiff_tpu.cli.distill "$TEACHER" --stages 64,32,16 \
  --iters 4000 --synthetic 2048 --synthetic_chem rich \
  --logdir "$R/distillC" > "$R/distillC.log" 2>&1
STUDENT="$R/distillC/stage16"
[ -d "$STUDENT" ] || { echo SERVE_DISTILL_FAILED; exit 1; }

PORT=7531
serve_requests () {  # name ckpt extra-flags...
  local name=$1 ckpt=$2; shift 2
  python -m agdiff_tpu.cli.serve "$ckpt" --port $PORT --fast \
    --w_global 0.3 --clip_local 20 "$@" > "$R/serve_$name.log" 2>&1 &
  local SPID=$!
  # wait for the socket, then one compile-paying warm request + 3 timed
  local i
  for i in $(seq 1 120); do
    sleep 5
    python -m agdiff_tpu.cli.serve --port $PORT --submit \
      '{"cmd": "ping"}' > /dev/null 2>&1 && break
  done
  for i in 0 1 2 3; do
    python -m agdiff_tpu.cli.serve --port $PORT --submit "{
      \"cmd\": \"generate\", \"synthetic\": 2, \"synthetic_chem\": \"rich\",
      \"num_confs\": 4, \"seed\": $((2021 + i)), \"resume\": false,
      \"out_dir\": \"$R/serve_${name}_out$i\"}" \
      | tee -a "$R/serve_${name}_requests.log"
  done
  python -m agdiff_tpu.cli.serve --port $PORT --submit \
    '{"cmd": "shutdown"}' > /dev/null 2>&1
  wait $SPID 2>/dev/null
}

serve_requests teacher5000 "$TEACHER" --n_steps 5000
serve_requests student16 "$STUDENT" --n_steps 16 --ladder strided \
  --sampling_type generalized --eta 0

echo === teacher@5000 ===; cat "$R/serve_teacher5000_requests.log"
echo === student@16 ===;   cat "$R/serve_student16_requests.log"
echo SERVE_DISTILL_DONE
