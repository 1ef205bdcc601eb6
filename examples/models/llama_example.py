"""End-to-end model flows — the analogue of the reference's
`examples/models/llama_transformers_example.py` (test_from_fp16 /
test_from_ckpt / test_lora / test_load, :22,93,164,244), adapted to the
zero-egress environment: the "fp16 checkpoint" is a random-weight TinyLlama-
shaped model (identical compute profile to a real checkpoint; to use a real
one, point AutoEETQForCausalLM.from_pretrained at its directory).

Run from the repo root: python examples/models/llama_example.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dataclasses
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

from eetq_tpu.models import ModelConfig, quantize_params, random_dense_params
from eetq_tpu.models.hf import load_quantized, save_quantized
from eetq_tpu.serve import Engine, greedy_generate
from eetq_tpu.serve.eval import delta_ppl

CFG = ModelConfig(
    vocab_size=1024, hidden_size=512, intermediate_size=1408, num_layers=4,
    num_heads=8, num_kv_heads=4, head_dim=64, max_position=512,
    model_type="llama",
)
PROMPT = np.arange(1, 33, dtype=np.int32)[None]  # stand-in prompt tokens


def flow_from_fp16():
    """eet_accelerator flow: dense model in, quantize, generate."""
    dense = random_dense_params(CFG, jax.random.PRNGKey(0), jnp.bfloat16)
    params = quantize_params(dense)  # the eet_quantize one-liner
    t0 = time.perf_counter()
    out = greedy_generate(params, CFG, jnp.asarray(PROMPT), 32)
    toks = np.asarray(out[0])
    dt = time.perf_counter() - t0
    print(f"[from_fp16] generated {len(toks)} tokens in {dt:.2f}s: {toks[:8]}...")
    return dense, params


def flow_quantize_save_load(params):
    """quantize -> save_quantized -> from_quantized roundtrip."""
    with tempfile.TemporaryDirectory() as d:
        save_quantized(params, CFG, d)
        cfg2, loaded = load_quantized(d)
        out = greedy_generate(loaded, cfg2, jnp.asarray(PROMPT), 8)
        print(f"[save/load] reloaded checkpoint generates: {np.asarray(out[0])}")


def flow_ppl(dense, params):
    """Quantization quality: delta perplexity on a token stream."""
    ids = np.random.default_rng(0).integers(0, CFG.vocab_size, size=512)
    r = delta_ppl(dense, params, CFG, ids, window=128)
    print(f"[ppl] dense={r['ppl_dense']:.2f} quant={r['ppl_quant']:.2f} "
          f"delta={r['delta_ppl']:+.4f}")


def flow_lora(params):
    """LoRA-over-frozen-quantized: side-path forward + gradient flow
    (the reference's test_lora merges adapters then quantizes; here the
    adapter stays live and trainable)."""
    from eetq_tpu.modules.linear import LoraAdapter, linear_apply

    ql = params.layers[0].qkv
    k, n, r = ql.in_features, ql.out_features, 8
    key = jax.random.PRNGKey(1)
    lora = LoraAdapter(
        lora_a=jax.random.normal(key, (k, r), jnp.float32) * 0.01,
        lora_b=jnp.zeros((r, n), jnp.float32),
        scaling=2.0,
    )
    x = jax.random.normal(key, (4, k), jnp.bfloat16)

    def loss(lora):
        return jnp.sum(linear_apply(ql, x, lora=lora) ** 2)

    g = jax.grad(loss)(lora)
    print(f"[lora] grad norms: A {jnp.linalg.norm(g.lora_a):.3f} "
          f"B {jnp.linalg.norm(g.lora_b):.3f} (quantized base frozen)")


def flow_continuous_batching(params):
    """Serve several requests through the continuous-batching engine."""
    eng = Engine(params, CFG, max_batch=4, max_len=256, prompt_buckets=(32, 64))
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(1, CFG.vocab_size, size=n)) for n in (5, 20, 11)]
    outs = eng.generate_all(prompts, max_new_tokens=16)
    for p, o in zip(prompts, outs):
        print(f"[engine] prompt len {len(p)} -> {o[:6]}...")


def flow_tp_reshard(dense):
    """Offline TP quantization: per-rank scales baked into one artifact."""
    from eetq_tpu.surgery.tp_reshard import quantize_params_tp

    qp = quantize_params_tp(dense, CFG, tp=2)
    print(f"[tp] o_proj scales shape (group-wise, 2 ranks): "
          f"{qp.layers[0].o_proj.scales.shape}")


if __name__ == "__main__":
    dense, params = flow_from_fp16()
    flow_quantize_save_load(params)
    flow_ppl(dense, params)
    flow_lora(params)
    flow_continuous_batching(params)
    flow_tp_reshard(dense)
    print("all flows OK")
