#!/bin/bash
# Round-3 continuation: a second machine restart wiped .rehearsals/ after
# arm M (distillation) was measured and committed, but BEFORE arms L (EMA)
# and N (multiref mode coverage) ran. Re-run just those two plus the shared
# arm-G teacher they compare against; arm M's numbers are already in
# CLAUDE.md/README and are NOT re-derived here.
#
# Retry-safe end to end (TRAIN_DONE sentinels + samples_all.npz skips),
# serialized through the single TPU chip. Scratch: /root/repo/.rehearsals.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
R=/root/repo/.rehearsals
mkdir -p "$R/armG"

# --- teacher: arm-G recipe retrain (rich chemistry, 45k fast recipe) ---
if [ ! -f "$R/armG/TRAIN_DONE" ]; then
  python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/qm9_fast.yml'))
cfg['train']['max_iters'] = 45000
yaml.safe_dump(cfg, open('/root/repo/.rehearsals/armG/cfg.yml', 'w'))
PYEOF
  LOGDIR=$(ls -d "$R"/armG/logs/cfg_* 2>/dev/null | tail -1)
  if [ -n "$LOGDIR" ]; then
    python -m agdiff_tpu.cli.train "$LOGDIR" \
      --synthetic 2048 --synthetic_chem rich \
      >> "$R/armG/train.log" 2>&1 && touch "$R/armG/TRAIN_DONE"
  else
    python -m agdiff_tpu.cli.train "$R/armG/cfg.yml" \
      --synthetic 2048 --synthetic_chem rich --logdir "$R/armG/logs" \
      > "$R/armG/train.log" 2>&1 && touch "$R/armG/TRAIN_DONE"
  fi
fi
[ -f "$R/armG/TRAIN_DONE" ] || { echo R3C_TEACHER_FAILED; exit 1; }
LOGDIR=$(ls -d "$R"/armG/logs/cfg_* | tail -1)
TEACHER=$(cat "$LOGDIR/best_model/POINTER")
echo "TEACHER=$TEACHER"

# teacher at the full 5000-step legacy protocol: within-run baseline for L
if [ ! -f "$R/teacher_full/samples_all.npz" ]; then
  python -m agdiff_tpu.cli.generate "$TEACHER" --synthetic 60 \
    --synthetic_chem rich --out_dir "$R/teacher_full" --packed \
    --num_confs 2x --w_global 0.3 --clip_local 20 --no_resume --end_idx 60 \
    > "$R/teacher_full.log" 2>&1
fi
if [ -f "$R/teacher_full/samples_all.npz" ]; then
  AGDIFF_PLATFORM=cpu python -m agdiff_tpu.cli.eval_covmat \
    "$R/teacher_full/samples_all.npz" >> "$R/teacher_full.log" 2>&1
  grep -H "MAT-R_mean" "$R/teacher_full.log" | tail -1
fi

# --- arm N: multiref mode-coverage protocol (uses teacher as "arm G") ---
bash /root/repo/tools/rehearsal_r3_multiref.sh "$TEACHER" "$R/armN"

# mode-coverage diagnostic: collapse vs geometric error on both N arms
for d in armG_multiref armN; do
  if [ -f "$R/armN/$d/samples_all.npz" ]; then
    AGDIFF_PLATFORM=cpu python /root/repo/tools/mode_coverage.py \
      "$R/armN/$d/samples_all.npz" > "$R/armN/$d.modecov.log" 2>&1
    tail -3 "$R/armN/$d.modecov.log"
  fi
done

# --- arm L: EMA shadow weights ---
bash /root/repo/tools/rehearsal_r3_ema.sh "$R/armL"

echo R3C_ALL_DONE
