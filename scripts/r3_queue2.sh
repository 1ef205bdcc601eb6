#!/bin/bash
# Round-3 second measurement queue: paged + sampled engine A/Bs on the
# fixed feed-per-free-slot harness, then the 13B batch sweep (BASELINE
# config 3). Appends JSON lines to /tmp/r3_sweep/results2.jsonl.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3_sweep
log() { echo "[r3-q2 $(date +%H:%M:%S)] $*" | tee -a /tmp/r3_sweep/progress2.log; }
run() {
  local name=$1 tmo=$2; shift 2
  log "START $name"
  timeout "$tmo" "$@" > "/tmp/r3_sweep/$name.log" 2>&1
  local rc=$?
  grep -h '^{' "/tmp/r3_sweep/$name.log" | tail -8 >> /tmp/r3_sweep/results2.jsonl
  log "DONE $name rc=$rc: $(grep -h '^{' /tmp/r3_sweep/$name.log | tail -1)"
}

EETQ_ENGINE_PAGED=1 run engine_paged_v3 1800 python scripts/bench_engine.py
EETQ_ENGINE_TEMP=0.8 run engine_sampled_v3 1800 python scripts/bench_engine.py
EETQ_SWEEP_PRESET=llama2-13b EETQ_SWEEP_BATCHES=1,2,4,8,16,32 \
  EETQ_BENCH_REPS=3 run sweep_13b 14000 python scripts/bench_sweep.py
log "Q2 COMPLETE"
