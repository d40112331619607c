#!/bin/bash
# Serving latency for the DRUGS serving default (round 4).
#
# The arm-Q follow-up validated DDIM-100 eta=1 on the EMA checkpoint as
# the Drugs serving protocol (paired BETTER than the 5000-step reference
# protocol on MAT-R, p=0.026, precision parity — README "DDIM-ladder
# transfer at Drugs size"). This measures what that buys a deployment:
# the same arm-Q EMA server answering identical Drugs-size requests
# (2 tree molecules, 20 heavy atoms, 4 samples each) under
#   (a) the full 5000-step reference protocol, and
#   (b) the validated DDIM-100 default,
# sequential requests, client-side wall-clock (tools/serve_latency_probe).
# First request pays compile (reported separately); steady = requests 2+.
#
# Usage: serve_drugs_default_bench.sh  (after armQ; retry-safe)
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
R=/root/repo/.rehearsals
ROOT="$R/armQ"
[ -f "$ROOT/TRAIN_DONE" ] || { echo ARMQ_NOT_TRAINED; exit 1; }
LOGDIR=$(ls -d "$ROOT"/logs/cfg_* | tail -1)
BEST=$(cat "$LOGDIR/best_model/POINTER")
echo "BEST=$BEST"
PORT=7541

serve_probe () {  # name extra-serve-flags...
  local name=$1; shift
  python -m agdiff_tpu.cli.serve "$BEST" --port $PORT --fast --packed \
    --ema --w_global 0.3 --clip_local 20 "$@" \
    > "$R/serve_drugs_$name.log" 2>&1 &
  local SPID=$!
  local i
  for i in $(seq 1 180); do
    sleep 5
    python -m agdiff_tpu.cli.serve --port $PORT --submit \
      '{"cmd": "ping"}' > /dev/null 2>&1 && break
  done
  python /root/repo/tools/serve_latency_probe.py --port $PORT \
    --requests 5 --chem tree --heavy 20 \
    | tee "$R/serve_drugs_${name}_probe.log"
  python -m agdiff_tpu.cli.serve --port $PORT --submit \
    '{"cmd": "shutdown"}' > /dev/null 2>&1
  wait $SPID 2>/dev/null
}

serve_probe ld5000 --n_steps 5000
serve_probe ddim100 --n_steps 100 --ladder strided \
  --sampling_type generalized --eta 1.0

echo === ld-5000 ===;  cat "$R/serve_drugs_ld5000_probe.log"
echo === DDIM-100 ===; cat "$R/serve_drugs_ddim100_probe.log"
echo SERVE_DRUGS_DEFAULT_DONE
