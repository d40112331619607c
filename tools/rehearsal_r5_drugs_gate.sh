#!/bin/bash
# Round-5 Drugs-point quality gate for the tight whole-stack kernel
# (engine tight-pksf, VERDICT r4 #3).
#
# Same-process A/B at the Drugs operating point (N=64 B=48 heavy=20,
# tools/ab_engines.py): tight-pksf 1.549 vs tight-slim 1.984 ms/step =
# 1.281x — well past the 1.05x gate threshold. The perf win ships only
# if quality holds at the Drugs serving recipe (DDIM-100 eta=1 on the
# arm-Q EMA checkpoint — the round-4 validated default).
#
# The arm-Q checkpoint was wiped (fourth machine restart), so this is
# also the one-command retrain-from-seed path for arm Q (drugs_fast.yml
# tree chem, 120k iters, EMA 0.999 — the round-4 recipe; seeds fixed).
# Evidence (paired tables + covmat npz) is written to git-tracked
# docs/evidence/armQ/ directly.
#
# Usage: bash tools/rehearsal_r5_drugs_gate.sh   (retry-safe)
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
R=/root/repo/.rehearsals
ROOT="$R/armQ"
EV=/root/repo/docs/evidence/armQ
mkdir -p "$ROOT" "$EV"

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
[ -f "$ROOT/TRAIN_DONE" ] || { echo ARMQ_TRAIN_FAILED; exit 1; }
LOGDIR=$(ls -d "$ROOT"/logs/cfg_* | tail -1)
BEST=$(cat "$LOGDIR/best_model/POINTER")
echo "BEST=$BEST"

geneval () {  # out_dir flags...  (Drugs serving recipe, co-seeded runs)
  local out=$1; shift
  if [ ! -f "$out/samples_all.npz" ]; then
    python -m agdiff_tpu.cli.generate "$BEST" \
      --synthetic 30 --synthetic_heavy 20 --out_dir "$out" --fast --ema \
      --sampling_type generalized --ladder strided --n_steps 100 --eta 1.0 \
      --num_confs 2x --w_global 0.3 --clip_local 20 --no_resume \
      --end_idx 30 "$@" > "$out.log" 2>&1
  fi
  [ -f "$out/samples_all.npz" ] || { echo "GEN_FAILED: $out"; return 1; }
  if [ ! -f "$out/samples_all_covmat.npz" ]; then
    AGDIFF_PLATFORM=cpu python -m agdiff_tpu.cli.eval_covmat \
      "$out/samples_all.npz" >> "$out.log" 2>&1
  fi
  cp "$out/samples_all_covmat.npz" "$EV/$(basename $out)_covmat.npz"
  grep -H "MAT-R_mean\|MAT-P_mean" "$out.log" | tail -2
}

FAIL=0
geneval "$ROOT/ddim100_slim" --engine tight-slim || FAIL=1   # gated default
geneval "$ROOT/ddim100_pksf" --engine tight-pksf || FAIL=1   # candidate

AGDIFF_PLATFORM=cpu python /root/repo/tools/paired_matr.py \
  --thresholds 1.25,2.0 \
  "$ROOT/ddim100_slim/samples_all_covmat.npz" \
  "$ROOT/ddim100_pksf/samples_all_covmat.npz" \
  | tee "$EV/paired_pksf_gate_drugs.txt"
cp "$EV/paired_pksf_gate_drugs.txt" "$ROOT/paired_pksf_gate_drugs.txt"

[ $FAIL = 0 ] && echo PKSF_DRUGS_GATE_DONE || echo PKSF_DRUGS_GATE_INCOMPLETE
