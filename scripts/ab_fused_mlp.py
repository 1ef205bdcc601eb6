"""Interleaved same-process A/B: fused MLP decode kernel on/off.

`fused_mlp` is a STATIC arg of decode_loop, so both variants compile as
distinct programs in ONE process and the runs interleave A,B,A,B,... —
the only A/B methodology that beats the ±2.5% cross-process drift (see
CLAUDE.md). Expected effect: one kernel launch per layer saved (~9 us
each) plus the XLA split/swiglu/residual glue between the MLP GEMVs.

Usage: python scripts/ab_fused_mlp.py
Env: EETQ_BENCH_PRESET (llama2-7b), EETQ_BENCH_PROMPT (1024),
     EETQ_BENCH_NEW_TOKENS (50), EETQ_AB_REPS (5)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np


def main():
    from bench import _fetch, build_params, measure_sync_overhead
    from eetq_tpu.models import PRESETS, init_caches
    from eetq_tpu.serve.generate import decode_loop, prefill

    preset = os.environ.get("EETQ_BENCH_PRESET", "llama2-7b")
    prompt_len = int(os.environ.get("EETQ_BENCH_PROMPT", 1024))
    new_tokens = int(os.environ.get("EETQ_BENCH_NEW_TOKENS", 50))
    reps = int(os.environ.get("EETQ_AB_REPS", 5))
    cfg = PRESETS[preset]
    sync_s = measure_sync_overhead()
    print(f"{preset} prompt={prompt_len} new={new_tokens} "
          f"sync={sync_s*1e3:.1f}ms", file=sys.stderr)

    params = build_params(cfg, quantized=True)
    max_len = prompt_len + new_tokens
    prompt = jnp.ones((1, prompt_len), jnp.int32)

    def fresh():
        caches = init_caches(cfg, 1, max_len)
        logits, caches = prefill(params, cfg, prompt, caches)
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return token, caches

    def run(fused):
        token, caches = fresh()
        _fetch(token)
        t0 = time.perf_counter()
        toks, _ = decode_loop(params, cfg, token, jnp.int32(prompt_len),
                              caches, new_tokens, fused_mlp=fused)
        out = np.asarray(toks)
        return max(time.perf_counter() - t0 - sync_s, 1e-9), out

    # compile both variants
    t0 = time.perf_counter()
    _, tok_a = run(False)
    print(f"compile base: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    _, tok_b = run(True)
    print(f"compile fused: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    assert (tok_a == tok_b).mean() > 0.9, "fused MLP changed greedy tokens"

    times = {False: [], True: []}
    for _ in range(reps):
        for fused in (False, True):
            dt, _ = run(fused)
            times[fused].append(dt)
    steps = new_tokens - 1
    base = min(times[False])
    fused = min(times[True])
    print(json.dumps({
        "metric": f"{preset}_fused_mlp_ab_tok_s",
        "value": round(steps / fused, 2),
        "unit": "tok/s",
        "base_tok_s": round(steps / base, 2),
        "fused_ms_step": round(fused / steps * 1e3, 3),
        "base_ms_step": round(base / steps * 1e3, 3),
        "delta_ms_step": round((base - fused) / steps * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
