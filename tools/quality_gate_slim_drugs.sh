#!/bin/bash
# Drugs-size quality gate for the narrow-storage default (round 4).
#
# The round-4 default switch makes bf16 generation run the slim engines
# (GenerationRunner auto-selects tight-slim at bucket >= 40). The QM9
# gate (tools/quality_gate_slim.sh) proved the storage narrowing is
# four-metric quality-neutral at the 5000-step protocol; this gate
# re-proves it at the Drugs flagship serving recipe (DDIM-100 eta=1 on
# the arm-Q EMA checkpoint, README "Drugs serving default") where score
# error and pair density are much larger.
#
# Pairs the existing ddim100 run (f32-storage tight engine, generated
# before the switch) against an identically-seeded tight-slim run.
# Gate: four-metric parity (no significant MAT/COV regression at
# thresholds 1.25/2.0 — the Drugs-size deltas, CLAUDE.md).
#
# Usage: quality_gate_slim_drugs.sh   (after rehearsal_r4_drugs_followup)
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
ROOT=/root/repo/.rehearsals/armQ
[ -f "$ROOT/ddim100/samples_all_covmat.npz" ] || { echo NEED_DDIM100; exit 1; }
LOGDIR=$(ls -d "$ROOT"/logs/cfg_* | tail -1)
BEST=$(cat "$LOGDIR/best_model/POINTER")

OUT="$ROOT/ddim100_slim"
if [ ! -f "$OUT/samples_all.npz" ]; then
  python -m agdiff_tpu.cli.generate "$BEST" \
    --synthetic 30 --synthetic_heavy 20 --out_dir "$OUT" --fast \
    --engine tight-slim --ema --sampling_type generalized \
    --ladder strided --n_steps 100 --eta 1.0 \
    --num_confs 2x --w_global 0.3 --clip_local 20 --no_resume \
    --end_idx 30 > "$OUT.log" 2>&1
fi
[ -f "$OUT/samples_all.npz" ] || { echo "GEN_FAILED: $OUT"; exit 1; }
if [ ! -f "$OUT/samples_all_covmat.npz" ]; then
  AGDIFF_PLATFORM=cpu python -m agdiff_tpu.cli.eval_covmat \
    "$OUT/samples_all.npz" >> "$OUT.log" 2>&1
fi
grep -H "MAT-R_mean\|MAT-P_mean" "$OUT.log" | tail -2

AGDIFF_PLATFORM=cpu python /root/repo/tools/paired_matr.py \
  --thresholds 1.25,2.0 \
  "$ROOT/ddim100/samples_all_covmat.npz" \
  "$OUT/samples_all_covmat.npz" \
  | tee "$ROOT/paired_slim_gate_drugs.txt"
echo SLIM_DRUGS_GATE_DONE
