#!/bin/bash
# Rehearsal arm L (round 3): EMA shadow weights (train.ema_decay 0.999) on
# the arm-G protocol (rich chemistry, 45k fast recipe). Every capacity/
# data/length axis is closed at the ~0.68 plateau; EMA is the standard
# diffusion-model quality lever the reference does not have. Eval BOTH the
# raw best checkpoint and its EMA shadow on the same 60 held-out molecules.
#
# Usage: rehearsal_r3_ema.sh [outroot]   (retry-safe: TRAIN_DONE sentinel,
# finished generations skipped via samples_all.npz)
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
ROOT=${1:-/tmp/rehearsal3l}
mkdir -p "$ROOT"

if [ ! -f "$ROOT/TRAIN_DONE" ]; then
  ROOT="$ROOT" python - <<'PYEOF'
import os
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/qm9_fast.yml'))
cfg['train']['max_iters'] = 45000
cfg['train']['ema_decay'] = 0.999
yaml.safe_dump(cfg, open(os.environ['ROOT'] + '/cfg.yml', 'w'))
PYEOF
  LOGDIR=$(ls -d "$ROOT"/logs/cfg_* 2>/dev/null | tail -1)
  if [ -n "$LOGDIR" ]; then
    # synthetic flags are CLI-side, not in the config snapshot: re-pass
    # them on resume (the seeded generator reproduces the same dataset)
    python -m agdiff_tpu.cli.train "$LOGDIR" \
      --synthetic 2048 --synthetic_chem rich \
      >> "$ROOT/train.log" 2>&1 && touch "$ROOT/TRAIN_DONE"
  else
    python -m agdiff_tpu.cli.train "$ROOT/cfg.yml" \
      --synthetic 2048 --synthetic_chem rich --logdir "$ROOT/logs" \
      > "$ROOT/train.log" 2>&1 && touch "$ROOT/TRAIN_DONE"
  fi
fi
[ -f "$ROOT/TRAIN_DONE" ] || { echo REHEARSAL3L_INCOMPLETE; exit 1; }
LOGDIR=$(ls -d "$ROOT"/logs/cfg_* | tail -1)
BEST=$(cat "$LOGDIR/best_model/POINTER")

FAIL=0
for mode in raw ema; do
  EXTRA=""
  [ $mode = ema ] && EXTRA="--ema"
  if [ ! -f "$ROOT/samples_$mode/samples_all.npz" ]; then
    python -m agdiff_tpu.cli.generate "$BEST" --synthetic 60 \
      --synthetic_chem rich --out_dir "$ROOT/samples_$mode" \
      --packed --num_confs 2x --w_global 0.3 --clip_local 20 --no_resume \
      --end_idx 60 $EXTRA > "$ROOT/gen_$mode.log" 2>&1
  fi
  [ -f "$ROOT/samples_$mode/samples_all.npz" ] || { FAIL=1; continue; }
  AGDIFF_PLATFORM=cpu python -m agdiff_tpu.cli.eval_covmat \
    "$ROOT/samples_$mode/samples_all.npz" >> "$ROOT/gen_$mode.log" 2>&1
  grep -H "MAT-R_mean" "$ROOT/gen_$mode.log" | tail -1
done
[ "$FAIL" = 0 ] && echo REHEARSAL3L_DONE || echo REHEARSAL3L_INCOMPLETE
