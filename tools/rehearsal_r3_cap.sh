#!/bin/bash
# Rehearsal arm H (round 3): MODEL-CAPACITY probe against the ~0.7 A
# plateau. Arm E (rigid geometry) eliminated torsion entropy as the cause;
# this arm changes exactly one knob vs arm G — hidden_dim 128 -> 192 —
# on the same rich distribution, same 45k/2048 protocol, same held-out
# eval. If MAT-R moves below ~0.6 A the plateau was capacity; if it stays,
# the model family is bounded on this distribution at this protocol.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/rehearsal3h && cd /tmp/rehearsal3h
python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/qm9_fast.yml'))
cfg['train']['max_iters'] = 45000
cfg['model']['hidden_dim'] = 192
yaml.safe_dump(cfg, open('/tmp/rehearsal3h/cfg.yml', 'w'))
PYEOF
python -m agdiff_tpu.cli.train /tmp/rehearsal3h/cfg.yml \
  --synthetic 2048 --synthetic_chem rich --logdir /tmp/rehearsal3h/logs \
  > /tmp/rehearsal3h_train.log 2>&1
LOGDIR=$(ls -d /tmp/rehearsal3h/logs/cfg_* | tail -1)
BEST=$(cat $LOGDIR/best_model/POINTER)
python -m agdiff_tpu.cli.generate $BEST --synthetic 60 --synthetic_chem rich \
  --out_dir /tmp/rehearsal3h/samples --packed --num_confs 2x --w_global 0.3 \
  --clip_local 20 --no_resume --end_idx 60 > /tmp/rehearsal3h_gen.log 2>&1
python -m agdiff_tpu.cli.eval_covmat /tmp/rehearsal3h/samples/samples_all.npz \
  >> /tmp/rehearsal3h_gen.log 2>&1
echo REHEARSAL3H_DONE
