#!/bin/bash
# Arm M' (round 3): progressive distillation FROM THE EMA SHADOW.
#
# Arm L measured the EMA shadow at MAT-R 0.685 vs raw 0.713 (paired -0.028)
# on the 45k rich recipe; arm M measured distilled students n64/n16 at
# 0.650/0.730 from a RAW teacher. Does the EMA gain survive stage-halving
# distillation (--ema_teacher: stage-0 teacher weights = the EMA shadow)?
# Students n64 and n16 are evaluated on the same legacy protocol / 60
# held-out rich molecules as arms L and M, so all deltas are paired.
#
# Usage: rehearsal_r3_ema_distill.sh   (after rehearsal_r3c.sh;
# retry-safe: cli.distill stage resume + samples_all.npz skips)
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
R=/root/repo/.rehearsals
LOGDIR=$(ls -d "$R"/armL/logs/cfg_* | tail -1)
TEACHER=$(cat "$LOGDIR/best_model/POINTER")
echo "EMA_TEACHER=$TEACHER"

python -m agdiff_tpu.cli.distill "$TEACHER" --ema_teacher --stages 64,32,16 \
  --iters 4000 --synthetic 2048 --synthetic_chem rich \
  --logdir "$R/distillE" > "$R/distillE.log" 2>&1
[ -d "$R/distillE/stage16" ] || { echo EMA_DISTILL_FAILED; exit 1; }

FAIL=0
for n in 64 16; do
  name="emastudent$n"
  if [ ! -f "$R/$name/samples_all.npz" ]; then
    python -m agdiff_tpu.cli.generate "$R/distillE/stage$n" \
      --sampling_type generalized --ladder strided --n_steps $n --eta 0 \
      --synthetic 60 --synthetic_chem rich --out_dir "$R/$name" --packed \
      --num_confs 2x --w_global 0.3 --clip_local 20 --no_resume \
      --end_idx 60 > "$R/$name.log" 2>&1
  fi
  [ -f "$R/$name/samples_all.npz" ] || { FAIL=1; continue; }
  AGDIFF_PLATFORM=cpu python -m agdiff_tpu.cli.eval_covmat \
    "$R/$name/samples_all.npz" >> "$R/$name.log" 2>&1
  grep -H "MAT-R_mean" "$R/$name.log" | tail -1
done
[ "$FAIL" = 0 ] && echo EMA_DISTILL_DONE || echo EMA_DISTILL_INCOMPLETE
