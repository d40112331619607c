#!/bin/bash
# Arm Q2 (round 4): does a LONGER distillation schedule rescue the
# precision loss arm Q measured at Drugs size?
#
# Arm Q distilled with the QM9-tuned budget (4k iters/stage) and the
# students lost precision decisively (n64 MAT-P +0.104 p<1e-4, COV-P@2.0
# -0.17; n16 worse on every metric). The documented caveat was that the
# higher Drugs-size score error might simply need more student training.
# This arm re-distills from the SAME arm-Q EMA teacher with 3x the budget
# (12k iters/stage, same stages 64->32->16, same data distribution) and
# evaluates n64/n16 on the SAME legacy test set, so paired_matr can answer
# (a) long-n64 vs raw 5000-step (does the precision gap close?) and
# (b) long-n64 vs short-n64 (did budget do anything at all?).
#
# Usage: rehearsal_r4_drugs_distill_budget.sh  (after armQ; retry-safe)
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
R=/root/repo/.rehearsals
ROOT="$R/armQ"
[ -f "$ROOT/TRAIN_DONE" ] || { echo ARMQ_NOT_TRAINED; exit 1; }
LOGDIR=$(ls -d "$ROOT"/logs/cfg_* | tail -1)
BEST=$(cat "$LOGDIR/best_model/POINTER")
echo "BEST=$BEST"

if [ ! -d "$ROOT/distill_long/stage16" ]; then
  python -m agdiff_tpu.cli.distill "$BEST" --ema_teacher --stages 64,32,16 \
    --iters 12000 --synthetic 8192 --synthetic_heavy 20 \
    --logdir "$ROOT/distill_long" > "$ROOT/distill_long.log" 2>&1
fi
[ -d "$ROOT/distill_long/stage16" ] || { echo ARMQ2_DISTILL_FAILED; exit 1; }

FAIL=0
for n in 64 16; do
  OUT="$ROOT/student${n}_long"
  if [ ! -f "$OUT/samples_all.npz" ]; then
    python -m agdiff_tpu.cli.generate "$ROOT/distill_long/stage$n" \
      --sampling_type generalized --ladder strided --n_steps $n --eta 0 \
      --synthetic 30 --synthetic_heavy 20 --out_dir "$OUT" --fast \
      --num_confs 2x --w_global 0.3 --clip_local 20 --no_resume \
      --end_idx 30 > "$OUT.log" 2>&1
  fi
  [ -f "$OUT/samples_all.npz" ] || { echo "GEN_FAILED: $OUT"; FAIL=1; continue; }
  if [ ! -f "$OUT/samples_all_covmat.npz" ]; then
    AGDIFF_PLATFORM=cpu python -m agdiff_tpu.cli.eval_covmat \
      "$OUT/samples_all.npz" >> "$OUT.log" 2>&1
  fi
  grep -H "MAT-R_mean\|MAT-P_mean" "$OUT.log" | tail -2
done

# (a) long students vs the raw 5000-step baseline, Drugs thresholds
AGDIFF_PLATFORM=cpu python /root/repo/tools/paired_matr.py \
  --thresholds 1.25,2.0 \
  "$ROOT/gen_raw/samples_all_covmat.npz" \
  "$ROOT/student64_long/samples_all_covmat.npz" \
  "$ROOT/student16_long/samples_all_covmat.npz" \
  | tee "$ROOT/paired_distill_long.txt"
# (b) long vs short students (same NFE, 3x training budget)
AGDIFF_PLATFORM=cpu python /root/repo/tools/paired_matr.py \
  --thresholds 1.25,2.0 \
  "$ROOT/student64/samples_all_covmat.npz" \
  "$ROOT/student64_long/samples_all_covmat.npz" \
  | tee "$ROOT/paired_distill_budget64.txt"
AGDIFF_PLATFORM=cpu python /root/repo/tools/paired_matr.py \
  --thresholds 1.25,2.0 \
  "$ROOT/student16/samples_all_covmat.npz" \
  "$ROOT/student16_long/samples_all_covmat.npz" \
  | tee "$ROOT/paired_distill_budget16.txt"
[ "$FAIL" = 0 ] && echo ARMQ2_DONE || echo ARMQ2_INCOMPLETE
