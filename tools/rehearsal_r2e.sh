#!/bin/bash
# Rehearsal arm E: RIGID synthetic geometry (deterministic tetrahedral
# embedding — conformation is a function of the graph, so it is fully
# learnable, unlike the random-torsion default whose MAT-R floor is the
# unlearnable dihedral entropy). Fast recipe; 60 held-out molecules.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/rehearsal2e && cd /tmp/rehearsal2e
python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/synthetic_qm9.yml'))
cfg['train']['max_iters'] = 45000
cfg['train']['val_freq'] = 1000
cfg['train']['step_chunk'] = 16
cfg['model']['dtype'] = 'bfloat16'
cfg['model']['packed_pairs'] = True
yaml.safe_dump(cfg, open('/tmp/rehearsal2e/cfg.yml', 'w'))
PYEOF
python -m agdiff_tpu.cli.train /tmp/rehearsal2e/cfg.yml \
  --synthetic 2048 --synthetic_rigid --logdir /tmp/rehearsal2e/logs \
  > /tmp/rehearsal2e_train.log 2>&1
LOGDIR=$(ls -d /tmp/rehearsal2e/logs/cfg_* | tail -1)
BEST=$(cat $LOGDIR/best_model/POINTER)
python -m agdiff_tpu.cli.generate $BEST --synthetic 60 --synthetic_rigid \
  --out_dir /tmp/rehearsal2e/samples --packed --num_confs 2x --w_global 0.3 \
  --clip_local 20 --no_resume --end_idx 60 > /tmp/rehearsal2e_gen.log 2>&1
python -m agdiff_tpu.cli.eval_covmat /tmp/rehearsal2e/samples/samples_all.npz \
  >> /tmp/rehearsal2e_gen.log 2>&1
echo REHEARSAL2E_DONE
