#!/bin/bash
# Round-3 TPU measurement queue — run when the axon relay is back.
# Each step appends one JSON line + logs under /tmp/r3_sweep/.
# Order: cheapest/most-important first so partial completion still pays.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3_sweep
log() { echo "[r3-sweep $(date +%H:%M:%S)] $*" | tee -a /tmp/r3_sweep/progress.log; }

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  log "START $name"
  timeout "$tmo" "$@" > "/tmp/r3_sweep/$name.log" 2>&1
  local rc=$?
  grep -h '^{' "/tmp/r3_sweep/$name.log" | tail -5 >> /tmp/r3_sweep/results.jsonl
  log "DONE $name rc=$rc: $(grep -h '^{' /tmp/r3_sweep/$name.log | tail -1)"
}

# 1. 7B W8A16 headline (sanity + the >=100 tok/s line), skip bf16 rebuild
# and the 13B estimate pass (the sweep covers 13B separately)
EETQ_BENCH_SKIP_BF16=1 EETQ_BENCH_13B=0 run bench_7b 2000 python bench.py

# 2. fused-MLP interleaved A/B (the headline lever) — int8 then int4
run ab_fused_mlp_8 2400 python scripts/ab_fused_mlp.py
EETQ_BENCH_BITS=4 run ab_fused_mlp_4 2400 python scripts/ab_fused_mlp.py

# 2b. tight-cache decode levers (flash-decode bl fix + int8 KV), interleaved
run ab_decode_levers 2400 python scripts/ab_decode_levers.py

# 3. engine: r2 workload (chaining + fused admission vs 136.5 r2 / 323 static)
run engine_dense 2400 python scripts/bench_engine.py
# 4. engine: paged A/B on the same workload
EETQ_ENGINE_PAGED=1 run engine_paged 3000 python scripts/bench_engine.py
# 5. engine: sampled workload (device-side sampled window)
EETQ_ENGINE_TEMP=0.8 run engine_sampled 2400 python scripts/bench_engine.py
# 6. mistral served trace (BASELINE config 4): mixed prompts up to 512,
# Poisson arrivals, p50/p99 per-token latency
EETQ_BENCH_PRESET=mistral-7b EETQ_ENGINE_TRACE=1 EETQ_ENGINE_REQUESTS=24 \
  EETQ_ENGINE_PROMPT=512 EETQ_ENGINE_NEW=64 \
  run engine_trace_mistral 3600 python scripts/bench_engine.py

# 7. 13B batch sweep to the memory limit (BASELINE config 3)
EETQ_SWEEP_PRESET=llama2-13b EETQ_SWEEP_BATCHES=1,2,4,8,16,32 \
  run sweep_13b 14000 python scripts/bench_sweep.py

log "SWEEP COMPLETE"
