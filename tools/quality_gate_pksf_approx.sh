#!/bin/bash
# Four-metric quality gate for the pksf-approx engines (round 5).
#
# The whole-stack kernel exposed a new critical path: inside the kernel
# the filter-MLP softplus is EXPOSED VPU (the XLA paths hide it under HBM
# traffic — round 3 measured activations at 0.3% of the *XLA* step), so
# the polynomial transcendentals (ops/approx.py, max err 1.9e-4..6.8e-4,
# below bf16 noise) can matter exactly where they were a measured wash.
# If the A/B (tools/ab_engines.py fast-pksf,fast-pksf-approx) shows a
# win, this gates quality at the arm-R recipe before any default flip.
#
# Requires the arm-R retrain of rehearsal_r5_gate.sh (TRAIN_DONE + the
# module-path lg_ema eval). Pairs pksf-approx against the module path AND
# against gated pksf, all four metrics, evidence into git.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
R=/root/repo/.rehearsals
ROOT="$R/armR"
EV=/root/repo/docs/evidence/armR
mkdir -p "$EV"
[ -f "$ROOT/TRAIN_DONE" ] || { echo "RUN rehearsal_r5_gate.sh FIRST"; exit 1; }
LOGDIR=$(ls -d "$ROOT"/logs/cfg_* | tail -1)
BEST=$(cat "$LOGDIR/best_model/POINTER")
echo "BEST=$BEST"

geneval () {  # out_dir flags...
  local out=$1; shift
  if [ ! -f "$out/samples_all.npz" ]; then
    python -m agdiff_tpu.cli.generate "$BEST" \
      --synthetic 60 --synthetic_chem rich --out_dir "$out" --packed \
      --num_confs 2x --w_global 0.3 --clip_local 20 --no_resume \
      --end_idx 60 --ema "$@" > "$out.log" 2>&1
  fi
  [ -f "$out/samples_all.npz" ] || { echo "GEN_FAILED: $out"; return 1; }
  if [ ! -f "$out/samples_all_covmat.npz" ]; then
    AGDIFF_PLATFORM=cpu python -m agdiff_tpu.cli.eval_covmat \
      "$out/samples_all.npz" >> "$out.log" 2>&1
  fi
  cp "$out/samples_all_covmat.npz" "$EV/$(basename $out)_covmat.npz"
  grep -H "MAT-R_mean\|MAT-P_mean" "$out.log" | tail -2
}

# module baseline: reuse the gate's lg_ema run if scratch survives, else
# regenerate it (same seeds -> same draw)
[ -f "$ROOT/lg_ema/samples_all_covmat.npz" ] || geneval "$ROOT/lg_ema" \
  || { echo MODULE_BASELINE_FAILED; exit 1; }
FAIL=0
geneval "$ROOT/lg_ema_pksfa" --fast --engine pksf-approx || FAIL=1

AGDIFF_PLATFORM=cpu python /root/repo/tools/paired_matr.py \
  "$ROOT/lg_ema/samples_all_covmat.npz" \
  "$ROOT/lg_ema_pksfa/samples_all_covmat.npz" \
  | tee "$EV/paired_pksf_approx_gate.txt"
if [ -f "$ROOT/lg_ema_pksf/samples_all_covmat.npz" ]; then
  AGDIFF_PLATFORM=cpu python /root/repo/tools/paired_matr.py \
    "$ROOT/lg_ema_pksf/samples_all_covmat.npz" \
    "$ROOT/lg_ema_pksfa/samples_all_covmat.npz" \
    | tee -a "$EV/paired_pksf_approx_gate.txt"
fi

[ $FAIL = 0 ] && echo PKSF_APPROX_GATE_DONE || echo PKSF_APPROX_GATE_INCOMPLETE
