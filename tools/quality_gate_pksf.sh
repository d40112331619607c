#!/bin/bash
# Quality gate for the whole-forward stack-kernel engine (pksf, round 4).
#
# pksf runs everything after the edge encoder as ONE Pallas kernel with
# bf16 MXU contractions + f32 accumulators (the slim XLA path's own
# arithmetic) — module-equal at f32, but at bf16 it is NOT value-identical
# to the module path, so the perf win ships only if protocol quality
# holds. Re-run arm R's legacy-protocol EMA evaluation (60 held-out rich
# molecules, exact reference 5000-step protocol, same seeds) through the
# pksf engine and pair it against the existing module-path run (lg_ema)
# and the already-gated slim run with the four-metric paired test.
# Gate: pksf's four metrics at parity with the module path.
#
# Usage: quality_gate_pksf.sh   (after rehearsal_r4_multiref_capstone.sh
#                                and quality_gate_slim.sh)
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
geneval "$ROOT/lg_ema_pksf" --fast --engine pksf || FAIL=1

AGDIFF_PLATFORM=cpu python /root/repo/tools/paired_matr.py \
  "$ROOT/lg_ema/samples_all_covmat.npz" \
  "$ROOT/lg_ema_slim/samples_all_covmat.npz" \
  "$ROOT/lg_ema_pksf/samples_all_covmat.npz" \
  | tee "$ROOT/paired_pksf_gate.txt"

[ $FAIL = 0 ] && echo PKSF_GATE_DONE
