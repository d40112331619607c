#!/bin/bash
# Rehearsal arm F: Drugs-size end-to-end with the fast recipe
# (configs/drugs_fast.yml shrunk to 30k iters) — validates bf16 + packed
# training at N=64 AND the auto-selected tight generation engine with a
# quality number. 30 held-out Drugs-size molecules, reference protocol.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/rehearsal2f && cd /tmp/rehearsal2f
python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/drugs_fast.yml'))
cfg['train']['max_iters'] = 30000
cfg['train']['val_freq'] = 1000
yaml.safe_dump(cfg, open('/tmp/rehearsal2f/cfg.yml', 'w'))
PYEOF
python -m agdiff_tpu.cli.train /tmp/rehearsal2f/cfg.yml \
  --synthetic 2048 --synthetic_heavy 20 --logdir /tmp/rehearsal2f/logs \
  > /tmp/rehearsal2f_train.log 2>&1
LOGDIR=$(ls -d /tmp/rehearsal2f/logs/cfg_* | tail -1)
BEST=$(cat $LOGDIR/best_model/POINTER)
python -m agdiff_tpu.cli.generate $BEST --synthetic 30 --synthetic_heavy 20 \
  --out_dir /tmp/rehearsal2f/samples --num_confs 2x --w_global 0.3 \
  --clip_local 20 --no_resume --end_idx 30 --fast \
  > /tmp/rehearsal2f_gen.log 2>&1
python -m agdiff_tpu.cli.eval_covmat /tmp/rehearsal2f/samples/samples_all.npz \
  >> /tmp/rehearsal2f_gen.log 2>&1
echo REHEARSAL2F_DONE
