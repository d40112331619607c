#!/bin/bash
# Round-2 rehearsal arm C: 2048 molecules, 60k iters, val_freq 1000 so the
# plateau LR scheduler (factor 0.6, patience 10) can actually fire — the
# 45k/val-5000 arms never decayed the LR (9 validations < patience),
# unlike the reference's long-run schedule. Generate from the best ckpt.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/rehearsal2c && cd /tmp/rehearsal2c
python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/synthetic_qm9.yml'))
cfg['train']['max_iters'] = 60000
cfg['train']['val_freq'] = 1000
cfg['train']['step_chunk'] = 16
yaml.safe_dump(cfg, open('/tmp/rehearsal2c/cfg.yml', 'w'))
PYEOF
python -m agdiff_tpu.cli.train /tmp/rehearsal2c/cfg.yml \
  --synthetic 2048 --logdir /tmp/rehearsal2c/logs > /tmp/rehearsal2c_train.log 2>&1
LOGDIR=$(ls -d /tmp/rehearsal2c/logs/cfg_* | tail -1)
BEST=$(cat $LOGDIR/best_model/POINTER)
python -m agdiff_tpu.cli.generate $BEST --synthetic 60 \
  --out_dir /tmp/rehearsal2c/samples --packed --num_confs 2x --w_global 0.3 \
  --clip_local 20 --no_resume --end_idx 60 > /tmp/rehearsal2c_gen.log 2>&1
python -m agdiff_tpu.cli.eval_covmat /tmp/rehearsal2c/samples/samples_all.npz \
  >> /tmp/rehearsal2c_gen.log 2>&1
echo REHEARSAL2C_DONE
