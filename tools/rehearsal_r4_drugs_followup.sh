#!/bin/bash
# Round-4 follow-up on arm Q (the Drugs-flagship production recipe):
#
#  (a) MULTIREF protocol evals at Drugs size — raw / EMA / EMA-distilled
#      n64 / n16 on 30 held-out multiref tree molecules (torsion-conformer
#      references), four-metric paired + mode-coverage diagnostics. The
#      legacy jitter protocol scores mode collapse a perfect 1.0
#      (tools/oracle_floor.py --multiref), so multiref is the headline
#      quality protocol from round 4 on.
#  (b) DDIM-ladder transfer at Drugs size (VERDICT r3 #8): n250/n100/n50
#      eta=1 on the arm Q EMA checkpoint, paired against the 5000-step
#      gen_ema run on the SAME legacy test set. DDIM-100 parity is proven
#      at QM9 size on two protocols; Drugs-size pair density and score
#      error differ, so transfer must be measured before the serving
#      default switches.
#
# Usage: rehearsal_r4_drugs_followup.sh   (after rehearsal_r3_drugs_capstone
# finishes; retry-safe via samples_all.npz skips)
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
R=/root/repo/.rehearsals
ROOT="$R/armQ"
[ -f "$ROOT/TRAIN_DONE" ] || { echo ARMQ_NOT_TRAINED; exit 1; }
LOGDIR=$(ls -d "$ROOT"/logs/cfg_* | tail -1)
BEST=$(cat "$LOGDIR/best_model/POINTER")
echo "BEST=$BEST"

geneval () {  # out_dir ckpt flags...
  local out=$1 ckpt=$2; shift 2
  if [ ! -f "$out/samples_all.npz" ]; then
    python -m agdiff_tpu.cli.generate "$ckpt" \
      --synthetic 30 --synthetic_heavy 20 --out_dir "$out" --fast \
      --num_confs 2x --w_global 0.3 --clip_local 20 --no_resume \
      --end_idx 30 "$@" > "$out.log" 2>&1
  fi
  [ -f "$out/samples_all.npz" ] || { echo "GEN_FAILED: $out"; return 1; }
  if [ ! -f "$out/samples_all_covmat.npz" ]; then
    AGDIFF_PLATFORM=cpu python -m agdiff_tpu.cli.eval_covmat \
      "$out/samples_all.npz" >> "$out.log" 2>&1
  fi
  grep -H "MAT-R_mean\|MAT-P_mean" "$out.log" | tail -2
}

FAIL=0
# ---- (a) multiref protocol, all four arm-Q variants ----
geneval "$ROOT/mr_raw" "$BEST" --synthetic_multiref || FAIL=1
geneval "$ROOT/mr_ema" "$BEST" --ema --synthetic_multiref || FAIL=1
for n in 64 16; do
  [ -d "$ROOT/distill/stage$n" ] && \
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

# ---- (b) DDIM ladder at Drugs size (legacy set, paired vs gen_ema) ----
for n in 250 100 50; do
  geneval "$ROOT/ddim$n" "$BEST" --ema --sampling_type generalized \
    --ladder strided --n_steps $n --eta 1.0 || FAIL=1
done
AGDIFF_PLATFORM=cpu python /root/repo/tools/paired_matr.py \
  "$ROOT/gen_ema/samples_all_covmat.npz" \
  "$ROOT/ddim250/samples_all_covmat.npz" \
  "$ROOT/ddim100/samples_all_covmat.npz" \
  "$ROOT/ddim50/samples_all_covmat.npz" \
  | tee "$ROOT/paired_ddim_drugs.txt"

# four-metric restatement of the legacy-protocol capstone table too
AGDIFF_PLATFORM=cpu python /root/repo/tools/paired_matr.py \
  "$ROOT/gen_raw/samples_all_covmat.npz" \
  "$ROOT/gen_ema/samples_all_covmat.npz" \
  "$ROOT/student64/samples_all_covmat.npz" \
  "$ROOT/student16/samples_all_covmat.npz" \
  | tee "$ROOT/paired_legacy4.txt"
[ "$FAIL" = 0 ] && echo R4_DRUGS_FOLLOWUP_DONE || echo R4_DRUGS_FOLLOWUP_INCOMPLETE

# round-5 evidence policy: persist the paired tables + covmat npz in git
EV=/root/repo/docs/evidence/armQ
mkdir -p "$EV"
cp -f "$ROOT"/paired_*.txt "$EV/" 2>/dev/null || true
for d in gen_raw gen_ema student64 student16 ddim250 ddim100 ddim50; do
  [ -f "$ROOT/$d/samples_all_covmat.npz" ] && \
    cp -f "$ROOT/$d/samples_all_covmat.npz" "$EV/${d}_covmat.npz"
done
echo "evidence copied to $EV"
