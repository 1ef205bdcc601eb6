"""Interleaved same-process A/B of the tight-cache decode levers
(VERDICT r2 item 7): flash-decode kernel and int8 KV on the plain
generate path, separately and together.

Round-2 measured both LOSING ~0.5 ms/step on tight caches; suspected
cause was the halve-from-512 L-block picker degrading a 1074-token cache
to bl=64 (17 grid steps x 32 unrolled MHA heads). The picker now takes
the largest divisor of lmax (1088 -> bl=544) — this script re-measures
all four variants interleaved in one process (static args -> four
compiled programs; cross-process drift can't contaminate the comparison).

Usage: python scripts/ab_decode_levers.py
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

    variants = {
        "base": dict(kv=jnp.bfloat16, dk=False),
        "flash_decode": dict(kv=jnp.bfloat16, dk=True),
        "int8_kv": dict(kv=jnp.int8, dk=False),
        "fd+int8kv": dict(kv=jnp.int8, dk=True),
    }

    def run(v):
        caches = init_caches(cfg, 1, max_len, dtype=v["kv"])
        logits, caches = prefill(params, cfg, prompt, caches)
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        _fetch(token)
        t0 = time.perf_counter()
        toks, _ = decode_loop(params, cfg, token, jnp.int32(prompt_len),
                              caches, new_tokens, decode_kernel=v["dk"])
        out = np.asarray(toks)
        return max(time.perf_counter() - t0 - sync_s, 1e-9), out

    toks0 = None
    for name, v in variants.items():
        t0 = time.perf_counter()
        _, toks = run(v)
        print(f"compile {name}: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        if toks0 is None:
            toks0 = toks
        else:
            agree = (toks == toks0).mean()
            print(f"  token agreement vs base: {agree:.2f}", file=sys.stderr)

    times = {k: [] for k in variants}
    for _ in range(reps):
        for name, v in variants.items():
            dt, _ = run(v)
            times[name].append(dt)
    steps = new_tokens - 1
    result = {
        "metric": f"{preset}_decode_levers_ab",
        "unit": "ms/step",
        "value": round(min(times["base"]) / steps * 1e3, 3),
    }
    for name in variants:
        result[f"{name}_ms_step"] = round(min(times[name]) / steps * 1e3, 3)
        result[f"{name}_tok_s"] = round(steps / min(times[name]), 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
