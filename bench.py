"""Headline benchmark: W8A16 decode throughput vs bf16 on the real TPU chip.

Mirrors the reference's benchmark config (`README.md:109-113`: llama-13b,
prompt=1024, max_new_tokens=50, batch sweep) scaled to what fits one v5e
chip: Llama-2-7B, batch=1. Weights are random (zero-egress environment) and
generated directly ON the device — identical compute/bandwidth profile to
real checkpoints.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is speedup / 1.8 (the BASELINE.md north-star: W8A16 decode
>= 1.8x bf16 at batch 1).

Env knobs: EETQ_BENCH_PRESET (default llama2-7b), EETQ_BENCH_PROMPT (1024),
EETQ_BENCH_NEW_TOKENS (50), EETQ_BENCH_BATCH (1).
"""

import gc
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from eetq_tpu.models import PRESETS, init_caches
from eetq_tpu.models.config import ModelConfig
from eetq_tpu.models.transformer import LayerParams, ModelParams
from eetq_tpu.modules.linear import DenseLinear, quantize_linear
from eetq_tpu.serve.generate import decode_loop, prefill, prefill_chunked


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _gen_layer(cfg: ModelConfig, key, quantized: bool) -> LayerParams:
    """Generate one layer's weights on-device; quantize immediately if
    requested so the dense copy is transient."""
    ks = jax.random.split(key, 4)
    h = cfg.hidden_size

    bits = int(os.environ.get("EETQ_BENCH_BITS", 8))

    def lin(k, kin, kout):
        w = (jax.random.normal(k, (kin, kout), jnp.bfloat16) * (kin**-0.5))
        if quantized:
            # pass bf16 directly: the jitted quantizer fuses the f32 cast,
            # avoiding a materialized f32 copy (matters for 13B-on-16GB)
            ql = quantize_linear(w, bits=bits)
            return ql
        return DenseLinear(weight=w)

    return LayerParams(
        input_norm=jnp.ones((h,), jnp.float32),
        qkv=lin(ks[0], h, cfg.qkv_out),
        o_proj=lin(ks[1], cfg.num_heads * cfg.head_dim, h),
        post_norm=jnp.ones((h,), jnp.float32),
        gateup=lin(ks[2], h, 2 * cfg.intermediate_size),
        down=lin(ks[3], cfg.intermediate_size, h),
    )


def build_params(cfg: ModelConfig, quantized: bool) -> ModelParams:
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, cfg.num_layers + 2)
    layers = []
    for i in range(cfg.num_layers):
        layers.append(_gen_layer(cfg, keys[i], quantized))
        jax.block_until_ready(jax.tree.leaves(layers[-1]))
    embed = (jax.random.normal(keys[-2], (cfg.vocab_size, cfg.hidden_size),
                               jnp.bfloat16) * 0.02)
    lm_w = jax.random.normal(
        keys[-1], (cfg.hidden_size, cfg.vocab_size), jnp.bfloat16
    ) * (cfg.hidden_size**-0.5)
    # default ON: int8 lm_head measured +1.8 tok/s on llama2-7b b=1 decode
    # (interleaved A/B, r2) with negligible logits error (test_accuracy);
    # EETQ_BENCH_QUANT_LMHEAD=0 reverts to the dense bf16 head
    if quantized and os.environ.get("EETQ_BENCH_QUANT_LMHEAD", "1") != "0":
        lm_head = quantize_linear(lm_w.astype(jnp.float32))
    else:
        lm_head = DenseLinear(weight=lm_w)
    return ModelParams(
        embed=embed,
        layers=layers,
        final_norm=jnp.ones((cfg.hidden_size,), jnp.float32),
        lm_head=lm_head,
    )


def _fetch(x):
    """Force real device execution by pulling a scalar to the host.

    NOTE: in this environment the TPU sits behind a relay on which
    jax.block_until_ready does NOT actually synchronize — only a host
    transfer does. The fixed relay round-trip is measured separately and
    subtracted from timings.
    """
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def measure_sync_overhead() -> float:
    x = jnp.ones((8,), jnp.float32)
    f = jax.jit(lambda x: x * 2)
    _fetch(f(x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _fetch(f(x))
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_decode(params, cfg, batch, prompt_len, new_tokens, sync_s) -> dict:
    """Times the single-dispatch scanned decode loop (real device time:
    host-fetch forced, relay overhead subtracted)."""
    max_len = prompt_len + new_tokens
    prompt = jnp.ones((batch, prompt_len), jnp.int32)
    # fused-MLP decode kernel: measured +0.8% on 7B W8A16 (interleaved A/B,
    # r3: 100.21 vs 99.45 tok/s, greedy tokens identical; neutral on int4),
    # so it is the bench default for quantized runs. EETQ_BENCH_FUSED_MLP=0
    # reverts. Dense (bf16) params have no quantized MLP weights to fuse.
    quantized = not isinstance(params.layers[0].gateup, DenseLinear)
    fused = quantized and os.environ.get("EETQ_BENCH_FUSED_MLP", "1") != "0"
    # KV cache dtype: int8 is the r5 DEFAULT for quantized runs (r4/r5
    # interleaved A/Bs: 9.64 vs 9.90 ms/step at 7B p1024; halves KV bytes
    # — also the 13B b>=2 enabler on 16 GB). EETQ_BENCH_KV=bf16 reverts;
    # the bf16 baseline model always benches with bf16 KV.
    # EETQ_BENCH_KV applies to the QUANTIZED run only — the bf16 baseline
    # is DEFINED at bf16 KV (the emitted row's baseline_kv field), so an
    # explicit int8 override must not silently change what the speedup
    # ratio means.
    kv_dtype = (
        {"bf16": jnp.bfloat16, "int8": jnp.int8}[
            os.environ.get("EETQ_BENCH_KV", "int8")
        ]
        if quantized
        else jnp.bfloat16
    )

    # EETQ_BENCH_PREFILL_CHUNK=N prefills in N-token chunks: bounds prefill
    # activation temps to the chunk (the 13B b=4 enabler — 13.2 GB weights
    # + 1.76 GB int8 KV leave <300 MB for whole-prompt prefill temps)
    chunk = int(os.environ.get("EETQ_BENCH_PREFILL_CHUNK", 0))

    def do_prefill(caches):
        if chunk:
            return prefill_chunked(params, cfg, prompt, caches, chunk=chunk)
        return prefill(params, cfg, prompt, caches)

    def run():
        caches = init_caches(cfg, batch, max_len, dtype=kv_dtype)
        logits, caches = do_prefill(caches)
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return token, caches

    # compile + warmup (prefill, then the scanned loop)
    t0 = time.perf_counter()
    token, caches = run()
    _fetch(token)
    compile_prefill = time.perf_counter() - t0
    t0 = time.perf_counter()
    toks, dcaches = decode_loop(params, cfg, token, jnp.int32(prompt_len),
                                caches, new_tokens, fused_mlp=fused)
    _fetch(toks)
    compile_decode = time.perf_counter() - t0
    log(f"  compile+first: prefill {compile_prefill:.1f}s decode {compile_decode:.1f}s")

    # timed prefill (free the warmup caches first — INCLUDING the caches
    # decode_loop returned: two live cache sets push 13B-on-16GB over the
    # edge at b>=2)
    del token, caches, toks, dcaches
    gc.collect()
    t0 = time.perf_counter()
    logits2, _c2 = do_prefill(
        init_caches(cfg, batch, max_len, dtype=kv_dtype)
    )
    _fetch(logits2)
    prefill_s = max(time.perf_counter() - t0 - sync_s, 1e-9)
    del logits2, _c2
    gc.collect()

    # timed scanned decode (steps = new_tokens - 1 after the prefill token);
    # best of N runs — the relay's run-to-run noise is one-sided (only ever
    # adds time) and can exceed 10% in bad stretches (r3: a best-of-3 read
    # 11.27 ms/step where back-to-back best-of-5 processes read 10.05), so
    # take the min over more reps
    steps = new_tokens - 1
    reps = int(os.environ.get("EETQ_BENCH_REPS", 6))
    decode_s = float("inf")
    for _ in range(reps):
        token, caches = run()
        _fetch(token)
        t0 = time.perf_counter()
        toks, dcaches = decode_loop(params, cfg, token, jnp.int32(prompt_len),
                                    caches, new_tokens, fused_mlp=fused)
        _fetch(toks)
        decode_s = min(decode_s, max(time.perf_counter() - t0 - sync_s, 1e-9))
        del token, caches, toks, dcaches  # next run() allocates fresh caches
    toks_per_s = batch * steps / decode_s
    return {
        "prefill_s": round(prefill_s, 4),
        "decode_tok_s": round(toks_per_s, 2),
        "ms_per_step": round(1e3 * decode_s / steps, 3),
    }


def bench_13b_estimate(sync_s: float) -> dict:
    """The honest 13B headline (BASELINE.md: Llama-2-13B W8A16 >= 1.8x FP16,
    batch=1, prompt=1024). bf16 13B does not fit the 16 GB chip, so the bf16
    baseline is ESTIMATED by measurement + linear extrapolation:

      1. measure the REAL scanned-decode step time of truncated bf16 13B
         models with K in {6, 12} layers (full generate path: embed, K real
         distinct-weight layers, attention over the 1024-token cache,
         lm_head, sampling — no microbench VMEM-staging artifacts);
      2. fit t_step(K) = a + b*K  (a = embed+lm_head+sampling+dispatch,
         b = per-layer cost); extrapolate to the 40-layer model;
      3. measure full 13B W8A16 decode FOR REAL (it fits), and report
         w8a16_tok_s / bf16_est_tok_s.

    Linearity holds because every layer is identical in shape and the decode
    step has no cross-layer reuse; the same fit at 7B (where bf16 fits)
    over-/under-predicts by <5% (validated in round 2 bring-up).
    """
    cfg = PRESETS["llama2-13b"]
    prompt_len, new_tokens = 1024, 50

    def truncated(k_layers):
        import dataclasses

        return dataclasses.replace(cfg, num_layers=k_layers)

    ks = (6, 12)
    per_k = {}
    for k_layers in ks:
        c = truncated(k_layers)
        log(f"building bf16 13B[{k_layers} layers]...")
        dense = build_params(c, quantized=False)
        r = bench_decode(dense, c, 1, prompt_len, new_tokens, sync_s)
        per_k[k_layers] = r["ms_per_step"]
        log(f"bf16 13B[{k_layers}]: {r}")
        del dense
        gc.collect()
    b = (per_k[ks[1]] - per_k[ks[0]]) / (ks[1] - ks[0])
    a = per_k[ks[0]] - b * ks[0]
    est_ms = a + b * cfg.num_layers
    bf16_est_tok_s = 1e3 / est_ms
    log(f"bf16 13B est: a={a:.3f}ms + {b:.3f}ms/layer x {cfg.num_layers} "
        f"= {est_ms:.2f} ms/step -> {bf16_est_tok_s:.2f} tok/s")

    log("building W8A16 13B (full)...")
    quant = build_params(cfg, quantized=True)
    r_q = bench_decode(quant, cfg, 1, prompt_len, new_tokens, sync_s)
    log(f"w8a16 13B: {r_q}")
    del quant
    gc.collect()
    return {
        "llama2_13b_w8a16_tok_s": r_q["decode_tok_s"],
        "llama2_13b_bf16_est_tok_s": round(bf16_est_tok_s, 2),
        "llama2_13b_bf16_est_ms_fit": {
            "per_layer_ms": round(b, 4),
            "overhead_ms": round(a, 4),
            "measured_layers": {str(k): per_k[k] for k in ks},
        },
        "llama2_13b_vs_bf16_est": round(
            r_q["decode_tok_s"] * est_ms / 1e3, 4
        ),
    }


def main():
    preset = os.environ.get("EETQ_BENCH_PRESET", "llama2-7b")
    bits = int(os.environ.get("EETQ_BENCH_BITS", 8))
    prompt_len = int(os.environ.get("EETQ_BENCH_PROMPT", 1024))
    new_tokens = int(os.environ.get("EETQ_BENCH_NEW_TOKENS", 50))
    batch = int(os.environ.get("EETQ_BENCH_BATCH", 1))
    cfg = PRESETS[preset]
    log(f"bench: {preset} batch={batch} prompt={prompt_len} new={new_tokens} "
        f"on {jax.devices()}")
    sync_s = measure_sync_overhead()
    log(f"host-sync overhead: {sync_s*1e3:.1f}ms (subtracted)")

    r_bf16 = None
    if not os.environ.get("EETQ_BENCH_SKIP_BF16"):
        log("building bf16 model...")
        t0 = time.perf_counter()
        dense = build_params(cfg, quantized=False)
        log(f"  built in {time.perf_counter() - t0:.1f}s")
        r_bf16 = bench_decode(dense, cfg, batch, prompt_len, new_tokens, sync_s)
        log(f"bf16:  {r_bf16}")
        del dense
        gc.collect()

    log("building W8A16 model...")
    t0 = time.perf_counter()
    quant = build_params(cfg, quantized=True)
    log(f"  built in {time.perf_counter() - t0:.1f}s")
    r_q = bench_decode(quant, cfg, batch, prompt_len, new_tokens, sync_s)
    log(f"w8a16: {r_q}")

    result = {
        "metric": f"{preset}_w{bits}a16_decode_tok_s_b{batch}_p{prompt_len}",
        "value": round(r_q["decode_tok_s"], 2),
        "unit": "tok/s",
        # record the knobs that change what the number means, so rows are
        # comparable across versions without out-of-band knowledge.
        # "kv" describes the QUANTIZED run (the metric); the bf16 baseline
        # always benches with bf16 KV (bench_decode's per-model default).
        "fused_mlp": os.environ.get("EETQ_BENCH_FUSED_MLP", "1") != "0",
        "kv": os.environ.get("EETQ_BENCH_KV", "int8"),
        "baseline_kv": "bf16",
        "reps": int(os.environ.get("EETQ_BENCH_REPS", 6)),
    }
    if r_bf16 is not None:
        speedup = r_q["decode_tok_s"] / r_bf16["decode_tok_s"]
        log(f"speedup: {speedup:.3f}x  (w8a16 {r_q['decode_tok_s']:.2f} tok/s "
            f"vs bf16 {r_bf16['decode_tok_s']:.2f} tok/s)")
        result["vs_baseline"] = round(speedup / 1.8, 4)

    # The BASELINE.md headline is defined at 13B; bf16-13B OOMs the chip, so
    # the ratio uses a measured-extrapolated bf16 estimate (methodology in
    # bench_13b_estimate's docstring + BASELINE.md). Skippable via env.
    # The 7B line prints IMMEDIATELY (the 13B pass adds ~15 min — if an
    # external timeout cuts the run, the headline survives); the final line,
    # when reached, carries everything. Consumers take the LAST json line.
    if os.environ.get("EETQ_BENCH_13B", "1") != "0" and preset == "llama2-7b":
        print(json.dumps(result), flush=True)
        del quant
        gc.collect()
        try:
            result.update(bench_13b_estimate(sync_s))
            if "llama2_13b_vs_bf16_est" in result:
                result["vs_baseline_13b"] = round(
                    result["llama2_13b_vs_bf16_est"] / 1.8, 4
                )
        except Exception as e:  # never lose the 7B headline to a 13B OOM
            log(f"13B estimate failed: {e!r}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
