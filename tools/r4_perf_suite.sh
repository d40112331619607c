#!/bin/bash
# Round-4 perf evidence suite (VERDICT r3 #4/#7 + fast-stack A/B).
# Run with the TPU otherwise idle and the host quiet — every number here is
# timing-sensitive (host contention inflates dispatch-bound measurements).
#
#   1. roofline @ QM9 size   (fast-xla / fast-stack / fast-tight)
#   2. roofline @ Drugs size (fast-xla / fast-tight)
#   3. same-process A/B fast-xla vs fast-stack at both sizes
#   4. serving soak test (mixed sizes, concurrent clients, capacity probe)
#
# Results land in .rehearsals/perf_r4/*.json|log; summarize into README.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/.rehearsals/perf_r4
mkdir -p "$OUT"

# 1+2: roofline (XLA compiled cost analysis + measured wall-clock)
[ -f "$OUT/roofline_qm9.log" ] || \
  python /root/repo/tools/roofline.py \
    --engines fast-xla,fast-stack,fast-tight \
    > "$OUT/roofline_qm9.log" 2>&1
tail -1 "$OUT/roofline_qm9.log"
[ -f "$OUT/roofline_drugs.log" ] || \
  python /root/repo/tools/roofline.py --nodes 64 --batch 48 --heavy 20 \
    --engines fast-xla,fast-tight \
    > "$OUT/roofline_drugs.log" 2>&1
tail -1 "$OUT/roofline_drugs.log"

# 3: interleaved same-process A/B (the only measurement that survives the
# +-7% cross-process tunnel noise)
[ -f "$OUT/ab_stack_qm9.log" ] || \
  python /root/repo/tools/ab_engines.py --engines fast-xla,fast-stack \
    > "$OUT/ab_stack_qm9.log" 2>&1
tail -3 "$OUT/ab_stack_qm9.log"
[ -f "$OUT/ab_stack_drugs.log" ] || \
  python /root/repo/tools/ab_engines.py --engines fast-xla,fast-stack \
    --nodes 64 --batch 48 --heavy 20 \
    > "$OUT/ab_stack_drugs.log" 2>&1
tail -3 "$OUT/ab_stack_drugs.log"

# 4: serving soak (distilled n16 student at QM9 size is the validated
# QM9 protocol; mixed with Drugs-size requests it exercises heterogeneous
# dynamic batching). Needs an arm R distilled ckpt; falls back to armQ.
CKPT=""
for c in /root/repo/.rehearsals/armR/distill/stage16 \
         /root/repo/.rehearsals/armQ/distill/stage16; do
  [ -d "$c" ] && CKPT="$c" && break
done
if [ -n "$CKPT" ] && [ ! -f "$OUT/soak.log" ]; then
  python -m agdiff_tpu.cli.serve "$CKPT" --fast --packed --port 7543 \
    --sampling_type generalized --ladder strided --n_steps 16 --eta 0 \
    --w_global 0.3 --clip_local 20 --batch_window 0.05 \
    --warm_nodes 24,48 --max_nodes 48 > "$OUT/serve.log" 2>&1 &
  SERVER_PID=$!
  # wait for the warm-up to finish (every power-of-two merge shape)
  for i in $(seq 1 120); do
    sleep 5
    grep -q "serving on" "$OUT/serve.log" && break
  done
  python /root/repo/tools/serve_soak.py --port 7543 --clients 8 \
    --duration 90 --sizes 9,20 --confs 2,4,8 --capacity 48 \
    > "$OUT/soak.log" 2>&1
  kill "$SERVER_PID" 2>/dev/null
fi
tail -5 "$OUT/soak.log" 2>/dev/null
echo PERF_SUITE_DONE
