#!/bin/bash
# Rehearsal arm N (round 3): the MULTIREF (GEOM-faithful) protocol — refs
# are distinct torsion conformers, so COV/MAT finally measure torsional
# MODE COVERAGE (the legacy jitter protocol scores a mode-collapsed model
# perfectly; tools/oracle_floor.py --multiref: distribution oracle
# COV-R@0.5 0.72 / MAT-R 0.39 vs mode-collapse 0.51 / 0.56 at num 30).
#
# Two questions:
#   (1) does arm G (trained on ONE conformer per graph) capture modes?
#       -> re-eval its checkpoint on the multiref protocol
#   (2) does per-conformer training data (--synthetic_confs 5, the GEOM
#       training layout) improve mode coverage at the same recipe?
#
# Usage: rehearsal_r3_multiref.sh [armG_ckpt] [outroot]
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
ARMG=${1:-/tmp/rehearsal3g/logs/cfg_2026_08_17__07_55_54/checkpoints/41008}
ROOT=${2:-/tmp/rehearsal3n}
mkdir -p "$ROOT"

geneval () {  # name ckpt — retry-safe like rehearsal_r3_distill.sh
  local name=$1 ckpt=$2
  if [ ! -f "$ROOT/$name/samples_all.npz" ]; then
    python -m agdiff_tpu.cli.generate "$ckpt" \
      --synthetic 60 --synthetic_chem rich --synthetic_multiref \
      --out_dir "$ROOT/$name" --packed --num_confs 2x --w_global 0.3 \
      --clip_local 20 --no_resume --end_idx 60 > "$ROOT/$name.log" 2>&1
  fi
  [ -f "$ROOT/$name/samples_all.npz" ] || return 1
  AGDIFF_PLATFORM=cpu python -m agdiff_tpu.cli.eval_covmat \
    "$ROOT/$name/samples_all.npz" >> "$ROOT/$name.log" 2>&1
  grep -H "MAT-R_mean" "$ROOT/$name.log" | tail -1
}

FAIL=0
# (1) the single-conformer-trained arm G on the mode-coverage protocol
geneval armG_multiref "$ARMG" || FAIL=1

# (2) arm N: identical recipe to arm G but per-conformer training entries
# (TRAIN_DONE sentinel + resume so an interrupted train is finished, not
# silently evaluated undertrained)
if [ ! -f "$ROOT/TRAIN_DONE" ]; then
  ROOT="$ROOT" python - <<'PYEOF'
import os
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/qm9_fast.yml'))
cfg['train']['max_iters'] = 45000
yaml.safe_dump(cfg, open(os.environ['ROOT'] + '/cfg.yml', 'w'))
PYEOF
  LOGDIR=$(ls -d "$ROOT"/logs/cfg_* 2>/dev/null | tail -1)
  if [ -n "$LOGDIR" ]; then
    # synthetic flags are CLI-side, not in the config snapshot: re-pass
    # them on resume (the seeded generator reproduces the same dataset)
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
[ -f "$ROOT/TRAIN_DONE" ] || { echo REHEARSAL3N_INCOMPLETE; exit 1; }
LOGDIR=$(ls -d "$ROOT"/logs/cfg_* | tail -1)
BEST=$(cat "$LOGDIR/best_model/POINTER")
geneval armN "$BEST" || FAIL=1
[ "$FAIL" = 0 ] && echo REHEARSAL3N_DONE || echo REHEARSAL3N_INCOMPLETE
