#!/bin/bash
# Multiref-protocol sampling sweep (round 3, post arm N).
#
# Arm N found the sampler OVER-disperses torsionally (gen/ref pairwise-RMSD
# ratio 1.38) while MAT-R sits at ~0.72 — geometric error, not collapse.
# Two follow-up questions, both cheap at few-step DDIM:
#   (1) does sampling stochasticity (eta) trade dispersion against MAT-R
#       on the protocol that actually measures diversity? DDIM n100 at
#       eta in {1.0, 0.5, 0.0} on the r3c teacher.
#   (2) does progressive distillation (trained against eta=0 teacher
#       rollouts) cost mode coverage? The distillC n16 student at its
#       native protocol, same eval.
# Every run: 60 held-out multiref rich molecules, eval_covmat + the
# mode_coverage diversity diagnostic.
#
# Usage: rehearsal_r3_multiref_sweep.sh   (after rehearsal_r3c.sh and
# serve_distilled_bench.sh; retry-safe via samples_all.npz skips)
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
R=/root/repo/.rehearsals
LOGDIR=$(ls -d "$R"/armG/logs/cfg_* | tail -1)
TEACHER=$(cat "$LOGDIR/best_model/POINTER")

geneval () {  # name ckpt flags...
  local name=$1 ckpt=$2; shift 2
  if [ ! -f "$R/sweep/$name/samples_all.npz" ]; then
    python -m agdiff_tpu.cli.generate "$ckpt" \
      --synthetic 60 --synthetic_chem rich --synthetic_multiref \
      --out_dir "$R/sweep/$name" --packed --num_confs 2x --w_global 0.3 \
      --clip_local 20 --no_resume --end_idx 60 "$@" \
      > "$R/sweep/$name.log" 2>&1
  fi
  [ -f "$R/sweep/$name/samples_all.npz" ] || { echo "SWEEP_${name}_FAILED"; return 1; }
  AGDIFF_PLATFORM=cpu python -m agdiff_tpu.cli.eval_covmat \
    "$R/sweep/$name/samples_all.npz" >> "$R/sweep/$name.log" 2>&1
  grep -H "MAT-R_mean" "$R/sweep/$name.log" | tail -1
  AGDIFF_PLATFORM=cpu python /root/repo/tools/mode_coverage.py \
    "$R/sweep/$name/samples_all.npz" > "$R/sweep/$name.modecov.log" 2>&1
  tail -2 "$R/sweep/$name.modecov.log"
}

mkdir -p "$R/sweep"
FAIL=0
for eta in 1.0 0.5 0.0; do
  geneval "ddim100_eta$eta" "$TEACHER" --sampling_type generalized \
    --ladder strided --n_steps 100 --eta "$eta" || FAIL=1
done
if [ -d "$R/distillC/stage16" ]; then
  geneval student16 "$R/distillC/stage16" --sampling_type generalized \
    --ladder strided --n_steps 16 --eta 0 || FAIL=1
fi
[ "$FAIL" = 0 ] && echo SWEEP_DONE || echo SWEEP_INCOMPLETE
