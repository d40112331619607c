#!/bin/bash
# Rehearsal arm I' (round 3): the apples-to-apples Drugs-scale TREND vs
# arm F — same tree chemistry as F, 4x its iters (120k) and 4x its data
# (8192), same held-out protocol with the auto-selected tight engine.
# (Arm I runs the same budget on the RICH distribution; comparing I to F
# confounds distribution with training length — this arm deconfounds.)
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/rehearsal3i2 && cd /tmp/rehearsal3i2
python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/drugs_fast.yml'))
cfg['train']['max_iters'] = 120000
yaml.safe_dump(cfg, open('/tmp/rehearsal3i2/cfg.yml', 'w'))
PYEOF
python -m agdiff_tpu.cli.train /tmp/rehearsal3i2/cfg.yml \
  --synthetic 8192 --synthetic_heavy 20 \
  --logdir /tmp/rehearsal3i2/logs > /tmp/rehearsal3i2_train.log 2>&1
LOGDIR=$(ls -d /tmp/rehearsal3i2/logs/cfg_* | tail -1)
BEST=$(cat $LOGDIR/best_model/POINTER)
python -m agdiff_tpu.cli.generate $BEST --synthetic 30 --synthetic_heavy 20 \
  --out_dir /tmp/rehearsal3i2/samples --num_confs 2x \
  --w_global 0.3 --clip_local 20 --no_resume --end_idx 30 --fast \
  > /tmp/rehearsal3i2_gen.log 2>&1
python -m agdiff_tpu.cli.eval_covmat /tmp/rehearsal3i2/samples/samples_all.npz \
  >> /tmp/rehearsal3i2_gen.log 2>&1
echo REHEARSAL3I2_DONE
