#!/bin/bash
# Rehearsal arm K (round 3): the LENGTH/DATA axis at QM9 size. Arm I'
# showed 4x training length moved Drugs-size MAT-R 1.676 -> 1.516; arms
# G/H/J closed the capacity axis (width/depth flat at 45k). This arm runs
# the arm-G protocol (rich chemistry, fast recipe) at 3x iters (135k) and
# 4x data (8192 molecules), with scheduler patience 12 (the arm-I finding:
# patience 6 decays too eagerly on 100k+ runs, choking LR while val is
# still improving).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/rehearsal3k && cd /tmp/rehearsal3k
python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/qm9_fast.yml'))
cfg['train']['max_iters'] = 135000
cfg['train']['scheduler']['patience'] = 12
yaml.safe_dump(cfg, open('/tmp/rehearsal3k/cfg.yml', 'w'))
PYEOF
python -m agdiff_tpu.cli.train /tmp/rehearsal3k/cfg.yml \
  --synthetic 8192 --synthetic_chem rich --logdir /tmp/rehearsal3k/logs \
  > /tmp/rehearsal3k_train.log 2>&1
LOGDIR=$(ls -d /tmp/rehearsal3k/logs/cfg_* | tail -1)
BEST=$(cat $LOGDIR/best_model/POINTER)
python -m agdiff_tpu.cli.generate $BEST --synthetic 60 --synthetic_chem rich \
  --out_dir /tmp/rehearsal3k/samples --packed --num_confs 2x --w_global 0.3 \
  --clip_local 20 --no_resume --end_idx 60 > /tmp/rehearsal3k_gen.log 2>&1
python -m agdiff_tpu.cli.eval_covmat /tmp/rehearsal3k/samples/samples_all.npz \
  >> /tmp/rehearsal3k_gen.log 2>&1
echo REHEARSAL3K_DONE
