#!/bin/bash
# TPU measurement queue (round 5): run serially the moment the tunnel is
# back; a detached watcher retries this script (probe-gated).  Logs +
# artifacts land in docs/artifacts/r5/ (committed — round-4 verdict weak
# #6: measurement provenance must survive the session).
#   nohup bash tools/tpu_queue_r5.sh &
# Stages: fused-sepconv race (verdict item 5); calibration-statistic
# sensitivity probe (item 3); bench.py headline refresh.
set -u
ART=/root/repo/docs/artifacts/r5
mkdir -p "$ART"
cd /root/repo

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$ART/queue.log"; }

log "stage 0: probe"
timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np, time
t0=time.time()
x = jnp.ones((1024,1024), jnp.bfloat16)
print('probe OK', float(np.asarray((x@x).sum())), f'{time.time()-t0:.1f}s')
" > "$ART/probe.log" 2>&1
if ! grep -q "probe OK" "$ART/probe.log"; then
  log "probe FAILED - tunnel still down, aborting queue"
  exit 1
fi
log "probe green: $(tail -1 "$ART/probe.log")"

if [ ! -f "$ART/fused_sepconv_race.done" ]; then
  log "stage 1: fused sepconv race (ops + e2e config 3)"
  timeout 3600 python tools/bench_fused_sepconv.py \
    > "$ART/fused_sepconv_race.log" 2>&1
  rc=$?
  log "fused race rc=$rc"
  [ $rc -eq 0 ] && touch "$ART/fused_sepconv_race.done"
fi

if [ ! -f "$ART/calib_sensitivity.done" ]; then
  log "stage 2: calibration-statistic sensitivity (amax vs p99.9)"
  timeout 5400 python tools/calib_sensitivity.py --family ssd --steps 3000 \
    > "$ART/calib_sensitivity.log" 2>&1
  rc=$?
  log "calib_sensitivity rc=$rc"
  [ $rc -eq 0 ] && touch "$ART/calib_sensitivity.done"
fi

if [ ! -f "$ART/bench_headline.done" ]; then
  log "stage 3: bench.py headline"
  timeout 2400 python bench.py > "$ART/bench_headline.json" 2>"$ART/bench_headline.err"
  rc=$?
  log "bench rc=$rc line: $(tail -1 "$ART/bench_headline.json")"
  [ $rc -eq 0 ] && touch "$ART/bench_headline.done"
fi

log "queue complete"
