#!/bin/bash
# Rehearsal arm D: validate the FAST training recipe end-to-end —
# bfloat16 + packed_pairs + chunked steps (91.9 steps/s measured) must
# reach the same quality plateau as the f32 dense arms (~0.7 A MAT-R).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/rehearsal2d && cd /tmp/rehearsal2d
python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/synthetic_qm9.yml'))
cfg['train']['max_iters'] = 45000
cfg['train']['val_freq'] = 1000
cfg['train']['step_chunk'] = 16
cfg['model']['dtype'] = 'bfloat16'
cfg['model']['packed_pairs'] = True
yaml.safe_dump(cfg, open('/tmp/rehearsal2d/cfg.yml', 'w'))
PYEOF
python -m agdiff_tpu.cli.train /tmp/rehearsal2d/cfg.yml \
  --synthetic 2048 --logdir /tmp/rehearsal2d/logs > /tmp/rehearsal2d_train.log 2>&1
LOGDIR=$(ls -d /tmp/rehearsal2d/logs/cfg_* | tail -1)
BEST=$(cat $LOGDIR/best_model/POINTER)
python -m agdiff_tpu.cli.generate $BEST --synthetic 60 \
  --out_dir /tmp/rehearsal2d/samples --packed --num_confs 2x --w_global 0.3 \
  --clip_local 20 --no_resume --end_idx 60 > /tmp/rehearsal2d_gen.log 2>&1
python -m agdiff_tpu.cli.eval_covmat /tmp/rehearsal2d/samples/samples_all.npz \
  >> /tmp/rehearsal2d_gen.log 2>&1
echo REHEARSAL2D_DONE
