#!/bin/bash
# Arm R (round 4): the QM9-size production recipe RESTATED UNDER THE
# MULTIREF PROTOCOL as the headline (VERDICT r3 "Next round" #3).
#
# Round 3 validated the production recipe (EMA shadow -> EMA-distill ->
# serve few-step students) on the LEGACY jitter protocol, which the
# repo's own oracle shows scores a mode-collapsed sampler a perfect 1.0
# (tools/oracle_floor.py --multiref). Arms L/M'/O checkpoints were wiped
# by machine restarts, so this arm re-trains the 45k rich recipe (EMA on,
# qm9_fast.yml ships ema_decay 0.999; the raw trajectory reproduces the
# r3c teacher bit-exactly — same seeds) and evaluates every variant on
# BOTH protocols with all four metrics, paired:
#
#   raw @ ld-5000, EMA @ ld-5000            (legacy + multiref)
#   EMA-distilled n64 / n16 students        (multiref; legacy numbers for
#                                            these exist from arm M')
#
# Expected from round 3 if conclusions transfer: legacy raw 0.713, EMA
# ~0.685; multiref raw ~0.718 (arm N measured the same recipe).
#
# Usage: rehearsal_r4_multiref_capstone.sh  (retry-safe: TRAIN_DONE
# sentinel, distill stage resume, samples_all.npz + covmat skips)
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
R=/root/repo/.rehearsals
ROOT="$R/armR"
mkdir -p "$ROOT"

if [ ! -f "$ROOT/TRAIN_DONE" ]; then
  python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/qm9_fast.yml'))
cfg['train']['max_iters'] = 45000
assert cfg['train']['ema_decay'] == 0.999
yaml.safe_dump(cfg, open('/root/repo/.rehearsals/armR/cfg.yml', 'w'))
PYEOF
  LOGDIR=$(ls -d "$ROOT"/logs/cfg_* 2>/dev/null | tail -1)
  if [ -n "$LOGDIR" ]; then
    python -m agdiff_tpu.cli.train "$LOGDIR" \
      --synthetic 2048 --synthetic_chem rich \
      >> "$ROOT/train.log" 2>&1 && touch "$ROOT/TRAIN_DONE"
  else
    python -m agdiff_tpu.cli.train "$ROOT/cfg.yml" \
      --synthetic 2048 --synthetic_chem rich --logdir "$ROOT/logs" \
      > "$ROOT/train.log" 2>&1 && touch "$ROOT/TRAIN_DONE"
  fi
fi
[ -f "$ROOT/TRAIN_DONE" ] || { echo ARMR_TRAIN_FAILED; exit 1; }
LOGDIR=$(ls -d "$ROOT"/logs/cfg_* | tail -1)
BEST=$(cat "$LOGDIR/best_model/POINTER")
echo "BEST=$BEST"

geneval () {  # out_dir ckpt flags...
  local out=$1 ckpt=$2; shift 2
  if [ ! -f "$out/samples_all.npz" ]; then
    python -m agdiff_tpu.cli.generate "$ckpt" \
      --synthetic 60 --synthetic_chem rich --out_dir "$out" --packed \
      --num_confs 2x --w_global 0.3 --clip_local 20 --no_resume \
      --end_idx 60 "$@" > "$out.log" 2>&1
  fi
  [ -f "$out/samples_all.npz" ] || { echo "GEN_FAILED: $out"; return 1; }
  if [ ! -f "$out/samples_all_covmat.npz" ]; then
    AGDIFF_PLATFORM=cpu python -m agdiff_tpu.cli.eval_covmat \
      "$out/samples_all.npz" >> "$out.log" 2>&1
  fi
  grep -H "MAT-R_mean\|MAT-P_mean" "$out.log" | tail -2
}

FAIL=0
# legacy-protocol continuity runs (paired vs round-3 teacher 0.713)
geneval "$ROOT/lg_raw" "$BEST" || FAIL=1
geneval "$ROOT/lg_ema" "$BEST" --ema || FAIL=1

# multiref-protocol headline runs
geneval "$ROOT/mr_raw" "$BEST" --synthetic_multiref || FAIL=1
geneval "$ROOT/mr_ema" "$BEST" --ema --synthetic_multiref || FAIL=1

# EMA-distillation (same recipe as arm M': stages from the EMA shadow)
if [ ! -d "$ROOT/distill/stage16" ]; then
  python -m agdiff_tpu.cli.distill "$BEST" --ema_teacher --stages 64,32,16 \
    --iters 4000 --synthetic 2048 --synthetic_chem rich \
    --logdir "$ROOT/distill" > "$ROOT/distill.log" 2>&1
fi
[ -d "$ROOT/distill/stage16" ] || { echo ARMR_DISTILL_FAILED; exit 1; }
for n in 64 16; do
  geneval "$ROOT/mr_student$n" "$ROOT/distill/stage$n" \
    --synthetic_multiref --sampling_type generalized --ladder strided \
    --n_steps $n --eta 0 || FAIL=1
done

for d in mr_raw mr_ema mr_student64 mr_student16; do
  if [ -f "$ROOT/$d/samples_all.npz" ] && [ ! -f "$ROOT/$d.modecov.log" ]; then
    AGDIFF_PLATFORM=cpu python /root/repo/tools/mode_coverage.py \
      "$ROOT/$d/samples_all.npz" > "$ROOT/$d.modecov.log" 2>&1
  fi
  tail -2 "$ROOT/$d.modecov.log" 2>/dev/null
done

AGDIFF_PLATFORM=cpu python /root/repo/tools/paired_matr.py \
  "$ROOT/mr_raw/samples_all_covmat.npz" \
  "$ROOT/mr_ema/samples_all_covmat.npz" \
  "$ROOT/mr_student64/samples_all_covmat.npz" \
  "$ROOT/mr_student16/samples_all_covmat.npz" \
  | tee "$ROOT/paired_multiref.txt"
AGDIFF_PLATFORM=cpu python /root/repo/tools/paired_matr.py \
  "$ROOT/lg_raw/samples_all_covmat.npz" \
  "$ROOT/lg_ema/samples_all_covmat.npz" \
  | tee "$ROOT/paired_legacy.txt"
[ "$FAIL" = 0 ] && echo ARMR_DONE || echo ARMR_INCOMPLETE
