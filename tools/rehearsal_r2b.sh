#!/bin/bash
# Round-2 scaled rehearsal, arm B: 4x training data (2048 synthetic
# molecules vs 512) at the same 45k iters -- the 512-mol run overfits
# after ~10k iters (val loss 466 -> 887), so scale data, not just steps.
# Eval: 60 held-out molecules, exact reference protocol.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/rehearsal2b && cd /tmp/rehearsal2b
python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/synthetic_qm9.yml'))
cfg['train']['max_iters'] = 45000
cfg['train']['val_freq'] = 5000
cfg['train']['step_chunk'] = 16
yaml.safe_dump(cfg, open('/tmp/rehearsal2b/synthetic_qm9_45k.yml', 'w'))
PYEOF
python -m agdiff_tpu.cli.train /tmp/rehearsal2b/synthetic_qm9_45k.yml \
  --synthetic 2048 --logdir /tmp/rehearsal2b/logs > /tmp/rehearsal2b_train.log 2>&1
LOGDIR=$(ls -d /tmp/rehearsal2b/logs/synthetic_qm9_45k_* | tail -1)
# generate from the BEST (lowest-val-loss) checkpoint, not the latest
BEST=$(cat $LOGDIR/best_model/POINTER)
python -m agdiff_tpu.cli.generate $BEST --synthetic 60 \
  --out_dir /tmp/rehearsal2b/samples --packed --num_confs 2x --w_global 0.3 \
  --clip_local 20 --no_resume --end_idx 60 > /tmp/rehearsal2b_gen.log 2>&1
python -m agdiff_tpu.cli.eval_covmat /tmp/rehearsal2b/samples/samples_all.npz \
  >> /tmp/rehearsal2b_gen.log 2>&1
echo REHEARSAL2B_DONE
