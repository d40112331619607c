#!/bin/bash
# Round-5 serving soak on the gated pksf defaults (VERDICT r4 #6).
#
# Round 4 soaked the distilled n16 student on the then-default slim/tight
# engines (1424 req / 0 errors / 149.3 conf/s sustained, p99 ~1.0-1.15 s).
# Round 5 flipped the bf16 defaults to the whole-stack Pallas kernels
# (pksf at QM9 buckets, tight-pksf at bucket>=40); this re-runs the exact
# round-4 workload on them: distill an n16 student from the arm-R EMA
# teacher (the retrain-from-seed checkpoint of rehearsal_r5_gate.sh),
# serve it with capacity-complete warm + dynamic batching, soak 8 mixed
# clients for 90 s, and probe the over-capacity rejection path.
#
# Evidence lands in docs/evidence/armR/soak_r5.txt (git-tracked).
# Retry-safe: distill stages resume, the soak re-runs.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
R=/root/repo/.rehearsals
EV=/root/repo/docs/evidence/armR
mkdir -p "$EV"
LOGDIR=$(ls -d "$R"/armR/logs/cfg_* | tail -1)
TEACHER=$(cat "$LOGDIR/best_model/POINTER")
echo "EMA_TEACHER=$TEACHER"

if [ ! -d "$R/armR/distill/stage16" ]; then
  python -m agdiff_tpu.cli.distill "$TEACHER" --ema_teacher \
    --stages 64,32,16 --iters 4000 --synthetic 2048 \
    --synthetic_chem rich --logdir "$R/armR/distill" \
    > "$R/armR/distill.log" 2>&1
fi
[ -d "$R/armR/distill/stage16" ] || { echo DISTILL_FAILED; exit 1; }

PORT=7544
python -m agdiff_tpu.cli.serve "$R/armR/distill/stage16" --fast --packed \
  --port $PORT --sampling_type generalized --ladder strided --n_steps 16 \
  --eta 0 --w_global 0.3 --clip_local 20 --batch_window 0.05 \
  --warm_nodes 24,48 --max_nodes 48 > "$R/armR/serve_r5.log" 2>&1 &
SERVER_PID=$!
# capacity-complete warm over the pksf/tight-pksf ladders: ~2-3 min per
# cold program into the repo-local XLA cache; allow up to 60 min
for i in $(seq 1 720); do
  sleep 5
  grep -q "serving on" "$R/armR/serve_r5.log" && break
done
grep -q "serving on" "$R/armR/serve_r5.log" || {
  kill "$SERVER_PID" 2>/dev/null; echo SERVER_NEVER_READY; exit 1; }

python /root/repo/tools/serve_soak.py --port $PORT --clients 8 \
  --duration 90 --sizes 9,20 --confs 2,4,8 --capacity 48 \
  | tee "$EV/soak_r5.txt"
RC=${PIPESTATUS[0]}
kill "$SERVER_PID" 2>/dev/null
[ "$RC" = 0 ] && echo SOAK_R5_DONE
