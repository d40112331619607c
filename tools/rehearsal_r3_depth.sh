#!/bin/bash
# Rehearsal arm J (round 3): DEPTH probe against the plateau — one knob vs
# arm G (num_convs 6 -> 8, same rich distribution, same 45k/2048 fast
# recipe, same held-out eval). Completes the capacity axis started by
# arm H (width 192: 0.711, no gain).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/rehearsal3j && cd /tmp/rehearsal3j
python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/qm9_fast.yml'))
cfg['train']['max_iters'] = 45000
cfg['model']['num_convs'] = 8
yaml.safe_dump(cfg, open('/tmp/rehearsal3j/cfg.yml', 'w'))
PYEOF
python -m agdiff_tpu.cli.train /tmp/rehearsal3j/cfg.yml \
  --synthetic 2048 --synthetic_chem rich --logdir /tmp/rehearsal3j/logs \
  > /tmp/rehearsal3j_train.log 2>&1
LOGDIR=$(ls -d /tmp/rehearsal3j/logs/cfg_* | tail -1)
BEST=$(cat $LOGDIR/best_model/POINTER)
python -m agdiff_tpu.cli.generate $BEST --synthetic 60 --synthetic_chem rich \
  --out_dir /tmp/rehearsal3j/samples --packed --num_confs 2x --w_global 0.3 \
  --clip_local 20 --no_resume --end_idx 60 > /tmp/rehearsal3j_gen.log 2>&1
python -m agdiff_tpu.cli.eval_covmat /tmp/rehearsal3j/samples/samples_all.npz \
  >> /tmp/rehearsal3j_gen.log 2>&1
echo REHEARSAL3J_DONE
