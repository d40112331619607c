#!/bin/bash
# Rehearsal arm G (round 3): the RICH synthetic chemistry distribution —
# rings + DOUBLE/TRIPLE/AROMATIC bonds + S/Cl heteroatoms — at QM9 size
# with the fast recipe (arm D protocol: 45k iters, 2048 molecules, 60
# held-out molecules at the exact reference protocol). This is the first
# arm where bond-embedding rows >= 2 and the GIN's edge-type handling are
# actually trained; compare MAT-R against arm D's 0.666 A on trees.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/rehearsal3g && cd /tmp/rehearsal3g
python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/qm9_fast.yml'))
cfg['train']['max_iters'] = 45000
yaml.safe_dump(cfg, open('/tmp/rehearsal3g/cfg.yml', 'w'))
PYEOF
python -m agdiff_tpu.cli.train /tmp/rehearsal3g/cfg.yml \
  --synthetic 2048 --synthetic_chem rich --logdir /tmp/rehearsal3g/logs \
  > /tmp/rehearsal3g_train.log 2>&1
LOGDIR=$(ls -d /tmp/rehearsal3g/logs/cfg_* | tail -1)
BEST=$(cat $LOGDIR/best_model/POINTER)
python -m agdiff_tpu.cli.generate $BEST --synthetic 60 --synthetic_chem rich \
  --out_dir /tmp/rehearsal3g/samples --packed --num_confs 2x --w_global 0.3 \
  --clip_local 20 --no_resume --end_idx 60 > /tmp/rehearsal3g_gen.log 2>&1
python -m agdiff_tpu.cli.eval_covmat /tmp/rehearsal3g/samples/samples_all.npz \
  >> /tmp/rehearsal3g_gen.log 2>&1
echo REHEARSAL3G_DONE
