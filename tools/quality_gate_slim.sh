#!/bin/bash
# Quality gate for the narrow-storage engine (fast-slim, round 4).
#
# fast-slim broke the 2.4 ms/step floor (1.111x fast-xla at the QM9
# operating point, tools/ab_engines.py) by storing the step's largest
# f32 buffers in bf16. It is NOT value-identical, so the perf win ships
# only if protocol quality holds: re-run arm R's legacy-protocol EMA
# evaluation (60 held-out rich molecules, exact reference 5000-step
# protocol, same seeds -> co-seeded init noise) through
#   (a) the fast-xla engine (--fast), and
#   (b) the slim engine   (--fast --engine slim),
# then pair BOTH against the existing module-path run (lg_ema) with the
# four-metric paired test. Gate: slim's four metrics at parity with
# fast-xla's (which is itself parity with the module path).
#
# Usage: quality_gate_slim.sh   (after rehearsal_r4_multiref_capstone.sh)
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
R=/root/repo/.rehearsals
ROOT="$R/armR"
[ -f "$ROOT/TRAIN_DONE" ] || { echo ARMR_NOT_TRAINED; exit 1; }
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
  grep -H "MAT-R_mean\|MAT-P_mean" "$out.log" | tail -2
}

FAIL=0
geneval "$ROOT/lg_ema_fast" --fast || FAIL=1
geneval "$ROOT/lg_ema_slim" --fast --engine slim || FAIL=1

AGDIFF_PLATFORM=cpu python /root/repo/tools/paired_matr.py \
  "$ROOT/lg_ema/samples_all_covmat.npz" \
  "$ROOT/lg_ema_fast/samples_all_covmat.npz" \
  "$ROOT/lg_ema_slim/samples_all_covmat.npz" \
  | tee "$ROOT/paired_slim_gate.txt"

[ $FAIL = 0 ] && echo SLIM_GATE_DONE
