#!/bin/bash
# Arm Q (round 3): the PRODUCTION RECIPE at the Drugs flagship config.
# Recipe = arm I' (drugs_fast.yml, 120k iters, 8192 tree molecules,
# <=20 heavy, N=64) + EMA shadow + EMA-distillation — the exact lever
# stack arm O validated at QM9 size (EMA -0.037 p=0.013; students at
# parity). The EMA shadow never feeds back, so the raw trajectory
# reproduces arm I' bit-exactly (MAT-R 1.516) and every comparison is
# perfectly paired.
#
# Evals (30 held-out Drugs-size molecules, exact reference protocol,
# auto-selected tight engine):
#   raw @ 5000-step protocol     (= arm I' reproduction)
#   EMA @ 5000-step protocol     (does the EMA gain hold at Drugs size?)
#   EMA-distilled n64 / n16      (does distillation hold at Drugs size?)
#
# Restart-safe: TRAIN_DONE sentinel, distill stage resume, samples skips.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
R=/root/repo/.rehearsals
ROOT="$R/armQ"
mkdir -p "$ROOT"

if [ ! -f "$ROOT/TRAIN_DONE" ]; then
  python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/drugs_fast.yml'))
cfg['train']['max_iters'] = 120000
assert cfg['train']['ema_decay'] == 0.999
yaml.safe_dump(cfg, open('/root/repo/.rehearsals/armQ/cfg.yml', 'w'))
PYEOF
  LOGDIR=$(ls -d "$ROOT"/logs/cfg_* 2>/dev/null | tail -1)
  if [ -n "$LOGDIR" ]; then
    python -m agdiff_tpu.cli.train "$LOGDIR" \
      --synthetic 8192 --synthetic_heavy 20 \
      >> "$ROOT/train.log" 2>&1 && touch "$ROOT/TRAIN_DONE"
  else
    python -m agdiff_tpu.cli.train "$ROOT/cfg.yml" \
      --synthetic 8192 --synthetic_heavy 20 \
      --logdir "$ROOT/logs" > "$ROOT/train.log" 2>&1 \
      && touch "$ROOT/TRAIN_DONE"
  fi
fi
[ -f "$ROOT/TRAIN_DONE" ] || { echo ARMQ_INCOMPLETE; exit 1; }
LOGDIR=$(ls -d "$ROOT"/logs/cfg_* | tail -1)
BEST=$(cat "$LOGDIR/best_model/POINTER")
echo "BEST=$BEST"

# 5000-step protocol: raw (arm I' reproduction) and EMA shadow
for variant in raw ema; do
  OUT="$ROOT/gen_$variant"
  FLAG=""
  [ "$variant" = ema ] && FLAG="--ema"
  if [ ! -f "$OUT/samples_all.npz" ]; then
    python -m agdiff_tpu.cli.generate "$BEST" $FLAG \
      --synthetic 30 --synthetic_heavy 20 --out_dir "$OUT" --fast \
      --num_confs 2x --w_global 0.3 --clip_local 20 --no_resume \
      --end_idx 30 > "$ROOT/gen_$variant.log" 2>&1
  fi
  [ -f "$OUT/samples_all.npz" ] || { echo "ARMQ_GEN_${variant}_FAILED"; exit 1; }
  AGDIFF_PLATFORM=cpu python -m agdiff_tpu.cli.eval_covmat \
    "$OUT/samples_all.npz" >> "$ROOT/gen_$variant.log" 2>&1
  grep -H "MAT-R_mean" "$ROOT/gen_$variant.log" | tail -1
done

# Distill from the EMA shadow on the SAME Drugs-size distribution
python -m agdiff_tpu.cli.distill "$BEST" --ema_teacher --stages 64,32,16 \
  --iters 4000 --synthetic 8192 --synthetic_heavy 20 \
  --logdir "$ROOT/distill" > "$ROOT/distill.log" 2>&1
[ -d "$ROOT/distill/stage16" ] || { echo ARMQ_DISTILL_FAILED; exit 1; }

FAIL=0
for n in 64 16; do
  OUT="$ROOT/student$n"
  if [ ! -f "$OUT/samples_all.npz" ]; then
    python -m agdiff_tpu.cli.generate "$ROOT/distill/stage$n" \
      --sampling_type generalized --ladder strided --n_steps $n --eta 0 \
      --synthetic 30 --synthetic_heavy 20 --out_dir "$OUT" --fast \
      --num_confs 2x --w_global 0.3 --clip_local 20 --no_resume \
      --end_idx 30 > "$ROOT/student$n.log" 2>&1
  fi
  [ -f "$OUT/samples_all.npz" ] || { FAIL=1; continue; }
  AGDIFF_PLATFORM=cpu python -m agdiff_tpu.cli.eval_covmat \
    "$OUT/samples_all.npz" >> "$ROOT/student$n.log" 2>&1
  grep -H "MAT-R_mean" "$ROOT/student$n.log" | tail -1
done

# Paired table (baseline = raw 5000-step = arm I' reproduction)
AGDIFF_PLATFORM=cpu python /root/repo/tools/paired_matr.py \
  "$ROOT/gen_raw/samples_all_covmat.npz" \
  "$ROOT/gen_ema/samples_all_covmat.npz" \
  "$ROOT/student64/samples_all_covmat.npz" \
  "$ROOT/student16/samples_all_covmat.npz" | tee "$ROOT/paired.txt"
[ "$FAIL" = 0 ] && echo ARMQ_DONE || echo ARMQ_INCOMPLETE
