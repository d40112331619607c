#!/bin/bash
# Arm O (round 3 capstone): EVERY validated quality lever composed at the
# longest scale. Recipe = arm K (135k iters, 8192 rich molecules, patience
# 12) + EMA shadow (qm9_fast.yml now ships ema_decay 0.999; the shadow
# never feeds back, so the raw trajectory reproduces arm K bit-exactly —
# the in-run raw eval IS arm K's 0.687 re-measured, giving perfect pairing)
# + progressive distillation FROM the EMA shadow (the arm M' recipe that
# produced the best run in the repo at 45k: 0.6452).
#
# Evals (same 60 held-out rich molecules, all paired):
#   raw @ 5000-step protocol      (= arm K reproduction)
#   EMA @ 5000-step protocol      (does the EMA gain persist at 135k?)
#   EMA-distilled n64 / n16       (does M' compose with scale?)
#
# Restart-safe: TRAIN_DONE sentinel, distill stage resume, samples skips.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
R=/root/repo/.rehearsals
ROOT="$R/armO"
mkdir -p "$ROOT"

if [ ! -f "$ROOT/TRAIN_DONE" ]; then
  python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/qm9_fast.yml'))
cfg['train']['max_iters'] = 135000
cfg['train']['scheduler']['patience'] = 12
assert cfg['train']['ema_decay'] == 0.999
yaml.safe_dump(cfg, open('/root/repo/.rehearsals/armO/cfg.yml', 'w'))
PYEOF
  LOGDIR=$(ls -d "$ROOT"/logs/cfg_* 2>/dev/null | tail -1)
  if [ -n "$LOGDIR" ]; then
    python -m agdiff_tpu.cli.train "$LOGDIR" \
      --synthetic 8192 --synthetic_chem rich \
      >> "$ROOT/train.log" 2>&1 && touch "$ROOT/TRAIN_DONE"
  else
    python -m agdiff_tpu.cli.train "$ROOT/cfg.yml" \
      --synthetic 8192 --synthetic_chem rich \
      --logdir "$ROOT/logs" > "$ROOT/train.log" 2>&1 \
      && touch "$ROOT/TRAIN_DONE"
  fi
fi
[ -f "$ROOT/TRAIN_DONE" ] || { echo ARMO_INCOMPLETE; exit 1; }
LOGDIR=$(ls -d "$ROOT"/logs/cfg_* | tail -1)
BEST=$(cat "$LOGDIR/best_model/POINTER")
echo "BEST=$BEST"

# 5000-step protocol: raw (arm K reproduction) and EMA shadow
for variant in raw ema; do
  OUT="$ROOT/gen_$variant"
  FLAG=""
  [ "$variant" = ema ] && FLAG="--ema"
  if [ ! -f "$OUT/samples_all.npz" ]; then
    python -m agdiff_tpu.cli.generate "$BEST" $FLAG \
      --synthetic 60 --synthetic_chem rich --out_dir "$OUT" --packed \
      --num_confs 2x --w_global 0.3 --clip_local 20 --no_resume \
      --end_idx 60 > "$ROOT/gen_$variant.log" 2>&1
  fi
  [ -f "$OUT/samples_all.npz" ] || { echo "ARMO_GEN_${variant}_FAILED"; exit 1; }
  AGDIFF_PLATFORM=cpu python -m agdiff_tpu.cli.eval_covmat \
    "$OUT/samples_all.npz" >> "$ROOT/gen_$variant.log" 2>&1
  grep -H "MAT-R_mean" "$ROOT/gen_$variant.log" | tail -1
done

# Distill from the EMA shadow (arm M' recipe), eval students n64 and n16
python -m agdiff_tpu.cli.distill "$BEST" --ema_teacher --stages 64,32,16 \
  --iters 4000 --synthetic 2048 --synthetic_chem rich \
  --logdir "$ROOT/distill" > "$ROOT/distill.log" 2>&1
[ -d "$ROOT/distill/stage16" ] || { echo ARMO_DISTILL_FAILED; exit 1; }

FAIL=0
for n in 64 16; do
  OUT="$ROOT/student$n"
  if [ ! -f "$OUT/samples_all.npz" ]; then
    python -m agdiff_tpu.cli.generate "$ROOT/distill/stage$n" \
      --sampling_type generalized --ladder strided --n_steps $n --eta 0 \
      --synthetic 60 --synthetic_chem rich --out_dir "$OUT" --packed \
      --num_confs 2x --w_global 0.3 --clip_local 20 --no_resume \
      --end_idx 60 > "$ROOT/student$n.log" 2>&1
  fi
  [ -f "$OUT/samples_all.npz" ] || { FAIL=1; continue; }
  AGDIFF_PLATFORM=cpu python -m agdiff_tpu.cli.eval_covmat \
    "$OUT/samples_all.npz" >> "$ROOT/student$n.log" 2>&1
  grep -H "MAT-R_mean" "$ROOT/student$n.log" | tail -1
done

# Paired table (baseline = raw 5000-step = arm K reproduction)
AGDIFF_PLATFORM=cpu python /root/repo/tools/paired_matr.py \
  "$ROOT/gen_raw/samples_all_covmat.npz" \
  "$ROOT/gen_ema/samples_all_covmat.npz" \
  "$ROOT/student64/samples_all_covmat.npz" \
  "$ROOT/student16/samples_all_covmat.npz" | tee "$ROOT/paired.txt"
[ "$FAIL" = 0 ] && echo ARMO_DONE || echo ARMO_INCOMPLETE
