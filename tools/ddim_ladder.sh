#!/bin/bash
# DDIM few-step quality ladder (round 3): the generalized sampler's whole
# point is steps<<5000 at protocol quality. Sweep n_steps for
# sampling_type=generalized (strided ladder, eta 1) on arm G's best
# checkpoint + the same 60 held-out rich molecules, and compare against
# the reference's ONLY few-step knob (suffix truncation with ld), which
# never visits high noise levels and should fall apart. Baseline: arm G
# full protocol (ld, 5000) = MAT-R 0.6801.
#
# Usage: ddim_ladder.sh <ckpt_pointer_or_logdir> <outroot>
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
CKPT=${1:?ckpt}
ROOT=${2:-/tmp/ddim_ladder}
mkdir -p "$ROOT"

run () {  # name extra-args...
  local name=$1; shift
  python -m agdiff_tpu.cli.generate "$CKPT" \
    --synthetic 60 --synthetic_chem rich \
    --out_dir "$ROOT/$name" --packed --num_confs 2x --w_global 0.3 \
    --clip_local 20 --no_resume --end_idx 60 "$@" \
    > "$ROOT/$name.log" 2>&1
  python -m agdiff_tpu.cli.eval_covmat "$ROOT/$name/samples_all.npz" \
    >> "$ROOT/$name.log" 2>&1
  grep -H "MAT-R_mean" "$ROOT/$name.log" | tail -1
}

for n in 500 250 100 50 25; do
  run "gen_e1_n$n" --sampling_type generalized --ladder strided \
      --n_steps "$n" --eta 1.0
done
run "gen_e0_n100" --sampling_type generalized --ladder strided \
    --n_steps 100 --eta 0.0
# the reference's few-step story: plain ld with a truncated suffix ladder
for n in 500 100; do
  run "ld_suffix_n$n" --sampling_type ld --ladder suffix --n_steps "$n"
done
echo DDIM_LADDER_DONE
