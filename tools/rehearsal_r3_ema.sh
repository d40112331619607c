#!/bin/bash
# Rehearsal arm L (round 3): EMA shadow weights (train.ema_decay 0.999) on
# the arm-G protocol (rich chemistry, 45k fast recipe). Every capacity/
# data/length axis is closed at the ~0.68 plateau; EMA is the standard
# diffusion-model quality lever the reference does not have. Eval BOTH the
# raw best checkpoint and its EMA shadow on the same 60 held-out molecules.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/rehearsal3l && cd /tmp/rehearsal3l
python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/qm9_fast.yml'))
cfg['train']['max_iters'] = 45000
cfg['train']['ema_decay'] = 0.999
yaml.safe_dump(cfg, open('/tmp/rehearsal3l/cfg.yml', 'w'))
PYEOF
python -m agdiff_tpu.cli.train /tmp/rehearsal3l/cfg.yml \
  --synthetic 2048 --synthetic_chem rich --logdir /tmp/rehearsal3l/logs \
  > /tmp/rehearsal3l_train.log 2>&1
LOGDIR=$(ls -d /tmp/rehearsal3l/logs/cfg_* | tail -1)
BEST=$(cat $LOGDIR/best_model/POINTER)
for mode in raw ema; do
  EXTRA=""
  [ $mode = ema ] && EXTRA="--ema"
  python -m agdiff_tpu.cli.generate $BEST --synthetic 60 \
    --synthetic_chem rich --out_dir /tmp/rehearsal3l/samples_$mode \
    --packed --num_confs 2x --w_global 0.3 --clip_local 20 --no_resume \
    --end_idx 60 $EXTRA > /tmp/rehearsal3l_gen_$mode.log 2>&1
  python -m agdiff_tpu.cli.eval_covmat \
    /tmp/rehearsal3l/samples_$mode/samples_all.npz \
    >> /tmp/rehearsal3l_gen_$mode.log 2>&1
done
echo REHEARSAL3L_DONE
