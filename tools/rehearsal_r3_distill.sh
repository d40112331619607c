#!/bin/bash
# Rehearsal arm M (round 3): progressive distillation (cli.distill) of the
# arm-G teacher (rich 45k, full-protocol MAT-R 0.680) into few-step DDIM
# students: 64 -> 32 -> 16 -> 8 steps. Controls: the UNdistilled teacher at
# eta=0 n=16/8 (the distillation claim is the delta against these — plain
# few-step DDIM at eta0 below ~50 steps degrades, see tools/ddim_ladder.sh
# results: eta1 n25 = 0.722, heun n12 = 0.914).
#
# Usage: rehearsal_r3_distill.sh [teacher_ckpt] [outroot]
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
TEACHER=${1:-/tmp/rehearsal3g/logs/cfg_2026_08_17__07_55_54/checkpoints/41008}
ROOT=${2:-/tmp/rehearsal3m}
mkdir -p "$ROOT"

python -m agdiff_tpu.cli.distill "$TEACHER" \
  --logdir "$ROOT/distill" --stages 64,32,16,8 --iters 4000 \
  --step_chunk 10 --val_freq 500 --lr 1e-4 \
  --synthetic 2048 --synthetic_chem rich --seed 2021 \
  > "$ROOT/distill.log" 2>&1

gen () {  # name ckpt n_steps — skips arms already generated (retry-safe)
  local name=$1 ckpt=$2 n=$3
  if [ ! -f "$ROOT/$name/samples_all.npz" ]; then
    python -m agdiff_tpu.cli.generate "$ckpt" \
      --synthetic 60 --synthetic_chem rich \
      --out_dir "$ROOT/$name" --packed --num_confs 2x --w_global 0.3 \
      --clip_local 20 --no_resume --end_idx 60 \
      --sampling_type generalized --ladder strided --eta 0.0 --n_steps "$n" \
      > "$ROOT/$name.log" 2>&1
  fi
  [ -f "$ROOT/$name/samples_all.npz" ] || return 1
  AGDIFF_PLATFORM=cpu python -m agdiff_tpu.cli.eval_covmat \
    "$ROOT/$name/samples_all.npz" >> "$ROOT/$name.log" 2>&1
  grep -H "MAT-R_mean" "$ROOT/$name.log" | tail -1
}

# the distill run itself must have completed every stage before sampling
[ -f "$ROOT/distill/STAGES.json" ] || { echo REHEARSAL3M_INCOMPLETE; exit 1; }

FAIL=0
# students at their trained step counts
for n in 64 32 16 8; do
  gen "student_n$n" "$ROOT/distill/stage$n" "$n" || FAIL=1
done
# undistilled controls at the aggressive step counts
for n in 16 8; do
  gen "teacher_e0_n$n" "$TEACHER" "$n" || FAIL=1
done
[ "$FAIL" = 0 ] && echo REHEARSAL3M_DONE || echo REHEARSAL3M_INCOMPLETE
