#!/bin/bash
# Rehearsal arm I (round 3): a REAL Drugs-scale quality run. Arm F trained
# 30k iters (1.5% of the reference's 2M recipe) and reported MAT-R 1.676 A
# as a baseline; this arm trains 4x longer (120k) on 4x the data (8192
# Drugs-size RICH molecules, <=20 heavy, N=64 bucket) and evals 30
# held-out molecules at the exact protocol with the auto-selected tight
# engine. Watch the MAT-R trend vs arm F.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/rehearsal3i && cd /tmp/rehearsal3i
python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/drugs_fast.yml'))
cfg['train']['max_iters'] = 120000
yaml.safe_dump(cfg, open('/tmp/rehearsal3i/cfg.yml', 'w'))
PYEOF
python -m agdiff_tpu.cli.train /tmp/rehearsal3i/cfg.yml \
  --synthetic 8192 --synthetic_heavy 20 --synthetic_chem rich \
  --logdir /tmp/rehearsal3i/logs > /tmp/rehearsal3i_train.log 2>&1
LOGDIR=$(ls -d /tmp/rehearsal3i/logs/cfg_* | tail -1)
BEST=$(cat $LOGDIR/best_model/POINTER)
python -m agdiff_tpu.cli.generate $BEST --synthetic 30 --synthetic_heavy 20 \
  --synthetic_chem rich --out_dir /tmp/rehearsal3i/samples --num_confs 2x \
  --w_global 0.3 --clip_local 20 --no_resume --end_idx 30 --fast \
  > /tmp/rehearsal3i_gen.log 2>&1
python -m agdiff_tpu.cli.eval_covmat /tmp/rehearsal3i/samples/samples_all.npz \
  >> /tmp/rehearsal3i_gen.log 2>&1
echo REHEARSAL3I_DONE
