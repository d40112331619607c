#!/bin/bash
# Sequential TPU queue: mono bench retry -> A/B + rehearsal pipeline.
while pgrep -f "train_profile.py" >/dev/null 2>&1; do sleep 20; done
cd /root/repo
python bench.py --engine fast-mono --bench-steps 250 > /tmp/bench_mono.log 2>&1
bash /root/repo/tools/tpu_pipeline_r2.sh > /tmp/pipeline_r2.log 2>&1
echo MASTER_DONE > /tmp/master_r2.done
