#!/bin/bash
# Arm N' (round 3): per-conformer training at MATCHED EPOCHS.
#
# Arm N found per-conformer entries (--synthetic_confs 5) WORSE than
# single-conformer training at matched 45k iters (+0.043 paired, p=0.036)
# — confounded by passes-per-graph: 5x entries at the same iteration count
# means 5x fewer epochs. N' deconfounds with 5x the iterations (225k),
# matching arm G's epochs over unique graphs. Patience widened to 12 per
# the arm-I/K finding (the patience-6 fast recipe decays too eagerly at
# 100k+ iters). Eval: the same multiref protocol/60 molecules as arm N.
#
# Usage: rehearsal_r3_multiref_long.sh [outroot]   (retry-safe)
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
ROOT=${1:-/root/repo/.rehearsals/armN2}
mkdir -p "$ROOT"

if [ ! -f "$ROOT/TRAIN_DONE" ]; then
  ROOT="$ROOT" python - <<'PYEOF'
import os
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/qm9_fast.yml'))
cfg['train']['max_iters'] = 225000
cfg['train']['scheduler']['patience'] = 12
yaml.safe_dump(cfg, open(os.environ['ROOT'] + '/cfg.yml', 'w'))
PYEOF
  LOGDIR=$(ls -d "$ROOT"/logs/cfg_* 2>/dev/null | tail -1)
  if [ -n "$LOGDIR" ]; then
    python -m agdiff_tpu.cli.train "$LOGDIR" \
      --synthetic 2048 --synthetic_chem rich --synthetic_confs 5 \
      >> "$ROOT/train.log" 2>&1 && touch "$ROOT/TRAIN_DONE"
  else
    python -m agdiff_tpu.cli.train "$ROOT/cfg.yml" \
      --synthetic 2048 --synthetic_chem rich --synthetic_confs 5 \
      --logdir "$ROOT/logs" > "$ROOT/train.log" 2>&1 \
      && touch "$ROOT/TRAIN_DONE"
  fi
fi
[ -f "$ROOT/TRAIN_DONE" ] || { echo REHEARSAL3N2_INCOMPLETE; exit 1; }
LOGDIR=$(ls -d "$ROOT"/logs/cfg_* | tail -1)
BEST=$(cat "$LOGDIR/best_model/POINTER")

if [ ! -f "$ROOT/samples/samples_all.npz" ]; then
  python -m agdiff_tpu.cli.generate "$BEST" \
    --synthetic 60 --synthetic_chem rich --synthetic_multiref \
    --out_dir "$ROOT/samples" --packed --num_confs 2x --w_global 0.3 \
    --clip_local 20 --no_resume --end_idx 60 > "$ROOT/gen.log" 2>&1
fi
[ -f "$ROOT/samples/samples_all.npz" ] || { echo REHEARSAL3N2_INCOMPLETE; exit 1; }
AGDIFF_PLATFORM=cpu python -m agdiff_tpu.cli.eval_covmat \
  "$ROOT/samples/samples_all.npz" >> "$ROOT/gen.log" 2>&1
grep -H "MAT-R_mean" "$ROOT/gen.log" | tail -1
AGDIFF_PLATFORM=cpu python /root/repo/tools/mode_coverage.py \
  "$ROOT/samples/samples_all.npz" > "$ROOT/modecov.log" 2>&1
tail -2 "$ROOT/modecov.log"
echo REHEARSAL3N2_DONE
