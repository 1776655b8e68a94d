#!/bin/bash
# TPU measurement queue (round 4): run serially the moment the tunnel
# is back.  A detached watcher retries this script every ~15 min
# (probe-gated); if the round ends before the tunnel returns, the next
# session reruns it:  nohup bash tools/tpu_queue.sh &
# Stages: bench.py headline; int8 quant mAP/throughput A/B; act8 train
# A/B; xdet prefilter parity; serving container bf16/int8; grad-accum
# overhead A/B.  Logs to /tmp/r4_tpu/.
# Each stage bounded; logs to /tmp/r4_tpu/.
set -u
mkdir -p /tmp/r4_tpu
cd /root/repo

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/r4_tpu/queue.log; }

log "stage 0: probe"
timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np, time
t0=time.time()
x = jnp.ones((1024,1024), jnp.bfloat16)
print('probe OK', float(np.asarray((x@x).sum())), f'{time.time()-t0:.1f}s')
" > /tmp/r4_tpu/probe.log 2>&1
if ! grep -q "probe OK" /tmp/r4_tpu/probe.log; then
  log "probe FAILED - tunnel still down, aborting queue"
  exit 1
fi
log "probe green: $(cat /tmp/r4_tpu/probe.log | tail -1)"

log "stage 1: bench.py (config-3 headline)"
timeout 2400 python bench.py > /tmp/r4_tpu/bench.json 2>/tmp/r4_tpu/bench.err
log "bench rc=$? line: $(tail -1 /tmp/r4_tpu/bench.json)"

log "stage 2: quant_ab (int8 A/B, both families, 2 seeds)"
timeout 7200 python tools/quant_ab.py --family both --steps 3000 --seeds 0,1 \
  > /tmp/r4_tpu/quant_ab.log 2>&1
log "quant_ab rc=$?"

log "stage 3: bench_train act8 A/B"
timeout 1800 python tools/bench_train.py --steps 30 > /tmp/r4_tpu/train_bf16.log 2>&1
log "train bf16 rc=$?"
timeout 1800 python tools/bench_train.py --steps 30 --act8 > /tmp/r4_tpu/train_act8.log 2>&1
log "train act8 rc=$?"

log "stage 4: fast_nms_ab xdet arm (prefilter mAP parity)"
timeout 5400 python tools/fast_nms_ab.py --family xdet --steps 3000 \
  > /tmp/r4_tpu/xdet_ab.log 2>&1
log "xdet_ab rc=$?"

log "stage 5: bench_serving container bf16 (post device_put fix)"
timeout 3600 python tools/bench_serving.py --batches 1,4,8,16 --container \
  > /tmp/r4_tpu/serving_bf16.log 2>&1
log "serving bf16 rc=$?"

log "stage 6: bench_serving container int8 (DESIGN 19 end-to-end)"
timeout 3600 python tools/bench_serving.py --batches 1,4,8,16 --container --quant int8 \
  > /tmp/r4_tpu/serving_int8.log 2>&1
log "serving int8 rc=$?"

log "stage 7: grad-accum overhead/memory A/B (batch 16 direct vs 4x4)"
timeout 1800 python tools/bench_train.py --steps 20 --no-aug \
  > /tmp/r4_tpu/train_accum1.log 2>&1
log "accum1 rc=$?"
timeout 1800 python tools/bench_train.py --steps 20 --no-aug --grad-accum 4 \
  > /tmp/r4_tpu/train_accum4.log 2>&1
log "accum4 rc=$?"

log "queue complete"
