#!/bin/bash
# Round-2 TPU pipeline: strided-ladder A/B (VERDICT 6), scaled rehearsal
# (VERDICT 8). Runs sequentially; the chip serializes anyway.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
CKPT=/tmp/rehearsal/logs/synthetic_qm9_2026_08_16__10_47_26
cd /tmp/rehearsal

# --- A/B: same molecules, same sample count, three ladders ---
for arm in "suffix 5000" "strided 1000" "suffix 1000"; do
  set -- $arm
  out=ab_${1}_${2}
  python -m agdiff_tpu.cli.generate $CKPT --synthetic 24 --out_dir $out \
    --packed --num_confs 2x --w_global 0.3 --clip_local 20 --no_resume \
    --ladder $1 --n_steps $2 --end_idx 24 \
    > /tmp/ab_${1}_${2}.log 2>&1
  python -m agdiff_tpu.cli.eval_covmat $out/samples_all.npz \
    >> /tmp/ab_${1}_${2}.log 2>&1
done

# --- scaled rehearsal: 3x longer training, 60-molecule eval ---
cd /tmp
mkdir -p rehearsal2 && cd rehearsal2
python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open('/root/repo/configs/synthetic_qm9.yml'))
cfg['train']['max_iters'] = 45000
cfg['train']['val_freq'] = 5000
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
echo PIPELINE_DONE
