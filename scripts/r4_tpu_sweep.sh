#!/bin/bash
# r4 consolidated TPU sweep: refresh every headline with the batched
# flash-decode kernel + fused paged admission. Appends JSON rows to
# scripts/r4_results.jsonl (stderr to the log).
cd "$(dirname "$0")/.."
out=scripts/r4_results.jsonl
run() { echo "=== $* ===" >&2; "$@" 2>>/tmp/r4_sweep.log | tail -1 >> $out; }
run env EETQ_ENGINE_TEMP=0.8 python scripts/bench_engine.py
run env EETQ_ENGINE_TRACE=1 EETQ_BENCH_PRESET=mistral-7b EETQ_ENGINE_PROMPT=512 EETQ_ENGINE_REQUESTS=24 python scripts/bench_engine.py
run env EETQ_BENCH_BITS=4 EETQ_BENCH_13B=0 EETQ_BENCH_SKIP_BF16=1 python bench.py
run python bench.py
echo "sweep done" >&2
