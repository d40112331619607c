#!/bin/bash
# Round-2 scaled rehearsal (VERDICT 8): 3x longer training than round 1
# (45k iters vs 15k), 60-molecule held-out eval at the exact reference
# protocol (5000 steps, 2x refs, w_global 0.3). Chunked train steps
# amortize the ~25 ms/program dispatch latency of the remote chip.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/rehearsal2 && cd /tmp/rehearsal2
python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/synthetic_qm9.yml'))
cfg['train']['max_iters'] = 45000
cfg['train']['val_freq'] = 5000
cfg['train']['step_chunk'] = 16
yaml.safe_dump(cfg, open('/tmp/rehearsal2/synthetic_qm9_45k.yml', 'w'))
PYEOF
python -m agdiff_tpu.cli.train /tmp/rehearsal2/synthetic_qm9_45k.yml \
  --synthetic 512 --logdir /tmp/rehearsal2/logs > /tmp/rehearsal2_train.log 2>&1
LOGDIR=$(ls -d /tmp/rehearsal2/logs/synthetic_qm9_45k_* | tail -1)
python -m agdiff_tpu.cli.generate $LOGDIR --synthetic 60 \
  --out_dir /tmp/rehearsal2/samples --packed --num_confs 2x --w_global 0.3 \
  --clip_local 20 --no_resume --end_idx 60 > /tmp/rehearsal2_gen.log 2>&1
python -m agdiff_tpu.cli.eval_covmat /tmp/rehearsal2/samples/samples_all.npz \
  >> /tmp/rehearsal2_gen.log 2>&1
echo REHEARSAL2_DONE
