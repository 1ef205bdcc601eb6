"""Engine throughput benchmark (VERDICT r1 §4): continuous-batching tok/s
with staggered arrivals, vs the scanned decode_loop on the same full batch.

The engine is host-driven, so host round-trips (the ~26 ms axon relay per
dispatch) are PART of its real cost — wall-clock is the honest metric here,
unlike kernel benchmarks. The multi-step decode window amortizes the relay
across decode_window tokens per dispatch.

Usage: python scripts/bench_engine.py
Env: EETQ_BENCH_PRESET (llama2-7b), EETQ_ENGINE_BATCH (4),
     EETQ_ENGINE_PROMPT (128), EETQ_ENGINE_NEW (64),
     EETQ_ENGINE_WINDOW (8), EETQ_ENGINE_REQUESTS (2*batch)
Prints one JSON line with engine tok/s and the scanned-loop comparison.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from bench import build_params, measure_sync_overhead
    from eetq_tpu.models import PRESETS, init_caches
    from eetq_tpu.serve.engine import Engine
    from eetq_tpu.serve.generate import decode_loop, prefill

    preset = os.environ.get("EETQ_BENCH_PRESET", "llama2-7b")
    batch = int(os.environ.get("EETQ_ENGINE_BATCH", 4))
    prompt_len = int(os.environ.get("EETQ_ENGINE_PROMPT", 128))
    new_tokens = int(os.environ.get("EETQ_ENGINE_NEW", 64))
    window = int(os.environ.get("EETQ_ENGINE_WINDOW", 8))
    n_requests = int(os.environ.get("EETQ_ENGINE_REQUESTS", 2 * batch))
    cfg = PRESETS[preset]
    max_len = prompt_len + new_tokens + 8

    log(f"engine bench: {preset} max_batch={batch} prompt={prompt_len} "
        f"new={new_tokens} window={window} requests={n_requests}")
    sync_s = measure_sync_overhead()
    log(f"host sync: {sync_s*1e3:.1f} ms")

    params = build_params(cfg, quantized=True)
    rng = np.random.default_rng(0)
    prompts = [
        list(rng.integers(1, cfg.vocab_size, size=prompt_len))
        for _ in range(n_requests)
    ]

    # --- static-batching reference: the same n_requests served as
    # consecutive full batches through prefill + the scanned decode loop
    # (prefill time INCLUDED — the engine pays it too) ---
    def static_batch(i0):
        prompt_arr = jnp.asarray(np.stack(prompts[i0 : i0 + batch]), jnp.int32)
        caches = init_caches(cfg, batch, max_len)
        logits, caches = prefill(params, cfg, prompt_arr, caches)
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        toks, _ = decode_loop(params, cfg, token, jnp.int32(prompt_len),
                              caches, new_tokens)
        return toks

    np.asarray(static_batch(0))  # compile + warm
    n_batches = n_requests // batch
    t0 = time.perf_counter()
    for bi in range(n_batches):
        np.asarray(static_batch(bi * batch))
    loop_s = max(time.perf_counter() - t0 - n_batches * sync_s, 1e-9)
    # the loop emits new_tokens per row (first token comes from prefill)
    loop_tok_s = n_requests * new_tokens / loop_s
    log(f"static batches (prefill + scanned loop): {loop_tok_s:.1f} tok/s")

    def run_engine(win) -> float:
        eng = Engine(params, cfg, max_batch=batch, max_len=max_len,
                     prompt_buckets=(prompt_len,), decode_window=win,
                     prefill_rows=min(4, batch))
        # warm compiles on BOTH decode paths (multi-window AND the
        # single-step used near admissions) plus prefill: a staggered
        # mini-workload shaped like the timed one
        us = [eng.add_request(prompts[i], new_tokens) for i in range(batch)]
        for _ in range(2):
            eng.step()
        us.append(eng.add_request(prompts[0], new_tokens))
        eng.run()
        assert all(len(eng.result(u)) == new_tokens for u in us)
        eng2 = Engine(params, cfg, max_batch=batch, max_len=max_len,
                      prompt_buckets=(prompt_len,), decode_window=win,
                      prefill_rows=min(4, batch))  # same compiles as warmup
        # staggered arrivals: half up front, the rest fed as slots free up
        uids = [eng2.add_request(p, new_tokens) for p in prompts[: batch]]
        pending = list(prompts[batch:])
        t0 = time.perf_counter()
        steps = 0
        while eng2.has_work or pending:
            if pending and len(eng2.queue) == 0 and steps % 2 == 1:
                uids.append(eng2.add_request(pending.pop(0), new_tokens))
            eng2.step()
            steps += 1
        dt = time.perf_counter() - t0
        total = sum(len(eng2.result(u)) for u in uids)
        assert total == n_requests * new_tokens, (total,)
        return total / dt

    eng_tok_s = run_engine(window)
    log(f"engine (window={window}): {eng_tok_s:.1f} tok/s")
    eng1_tok_s = run_engine(1)
    log(f"engine (window=1):      {eng1_tok_s:.1f} tok/s")

    print(json.dumps({
        "metric": f"{preset}_engine_tok_s_b{batch}_w{window}",
        "value": round(eng_tok_s, 2),
        "unit": "tok/s",
        "engine_window1_tok_s": round(eng1_tok_s, 2),
        "static_batching_tok_s": round(loop_tok_s, 2),
        "engine_vs_loop": round(eng_tok_s / loop_tok_s, 4),
    }))


if __name__ == "__main__":
    main()
