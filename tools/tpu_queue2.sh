#!/bin/bash
# TPU measurement queue #2 (round 4, after the bench_serving refactor):
# the serving surface for BASELINE config 2 (ssd_resnet50 — the int8
# ship target) bf16 + int8, and the lighthead int8 container re-measured
# now that the tool prequantizes (queue #1's int8 container stored fp32
# kernels as the runtime argument; DESIGN §20 notes those ratios are a
# lower bound).  Logs to /tmp/r4_tpu2/.   nohup bash tools/tpu_queue2.sh &
set -u
mkdir -p /tmp/r4_tpu2
cd /root/repo

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/r4_tpu2/queue.log; }

log "stage 0: probe"
timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np, time
t0=time.time()
x = jnp.ones((1024,1024), jnp.bfloat16)
print('probe OK', float(np.asarray((x@x).sum())), f'{time.time()-t0:.1f}s')
" > /tmp/r4_tpu2/probe.log 2>&1
if ! grep -q "probe OK" /tmp/r4_tpu2/probe.log; then
  log "probe FAILED - tunnel down, aborting queue"
  exit 1
fi
log "probe green: $(cat /tmp/r4_tpu2/probe.log | tail -1)"

log "stage 1: bench_serving ssd bf16 container (config-2 serving rows)"
timeout 3600 python tools/bench_serving.py --family ssd --batches 1,4,8,16 \
  --container > /tmp/r4_tpu2/ssd_bf16.log 2>&1
log "ssd bf16 rc=$?"

log "stage 2: bench_serving ssd int8 container (ship target end-to-end)"
timeout 3600 python tools/bench_serving.py --family ssd --batches 1,4,8,16 \
  --container --quant int8 > /tmp/r4_tpu2/ssd_int8.log 2>&1
log "ssd int8 rc=$?"

log "stage 3: bench_serving lighthead int8 container (prequantized)"
timeout 3600 python tools/bench_serving.py --family lighthead \
  --batches 1,4,8,16 --container --quant int8 \
  > /tmp/r4_tpu2/lh_int8.log 2>&1
log "lh int8 rc=$?"

log "queue complete"
