#!/bin/bash
# Round-3 continuation master: a machine restart wiped /tmp, losing the
# arm-G teacher checkpoint and the three pending quality arms (L: EMA,
# M: progressive distillation, N: multiref mode coverage). Re-run them,
# serialized through the single TPU chip, with all outputs in the
# repo-local .rehearsals/ scratch (survives restarts; gitignored).
#
# Retry-safe end to end: trains are marked by TRAIN_DONE sentinels (and
# resume from their latest checkpoint), finished generations are skipped
# via samples_all.npz, cli.distill skips completed stages via DONE.json.
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
    # synthetic flags are CLI-side, not in the config snapshot: re-pass
    # them on resume (the seeded generator reproduces the same dataset)
    python -m agdiff_tpu.cli.train "$LOGDIR" \
      --synthetic 2048 --synthetic_chem rich \
      >> "$R/armG/train.log" 2>&1 && touch "$R/armG/TRAIN_DONE"
  else
    python -m agdiff_tpu.cli.train "$R/armG/cfg.yml" \
      --synthetic 2048 --synthetic_chem rich --logdir "$R/armG/logs" \
      > "$R/armG/train.log" 2>&1 && touch "$R/armG/TRAIN_DONE"
  fi
fi
[ -f "$R/armG/TRAIN_DONE" ] || { echo R3B_TEACHER_FAILED; exit 1; }
LOGDIR=$(ls -d "$R"/armG/logs/cfg_* | tail -1)
TEACHER=$(cat "$LOGDIR/best_model/POINTER")
echo "TEACHER=$TEACHER"

# teacher at the full 5000-step protocol: the within-run baseline every
# distill/EMA delta is read against (the original arm G scored 0.680)
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

# --- arm M: progressive distillation into few-step DDIM students ---
bash /root/repo/tools/rehearsal_r3_distill.sh "$TEACHER" "$R/armM"

# --- arm N: multiref mode-coverage protocol ---
bash /root/repo/tools/rehearsal_r3_multiref.sh "$TEACHER" "$R/armN"

# --- arm L: EMA shadow weights ---
bash /root/repo/tools/rehearsal_r3_ema.sh "$R/armL"

echo R3B_ALL_DONE
