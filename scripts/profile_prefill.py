"""Prefill roofline decomposition: llama2-7b W8A16 at prompt=1024 on the
real TPU (VERDICT r4 #9 — publish the prefill counterpart of the decode
roofline table).

Times each prefill component in an on-device fori_loop (single dispatch,
relay-proof) and reports TF/s per GEMM against the v5e peaks (197 TF/s
bf16 — the dequant path's MXU consumes bf16 — and 394 TF/s int8 for the
W8A8 path). The end-to-end prefill is ALSO timed via the production
`serve.generate.prefill` (host-fetch-synced) because fori_loop
microbenches let XLA stage loop-invariant weights in VMEM; for
compute-bound prefill shapes that bias is small but the honest total is
the production path.

Env: EETQ_PROF_PROMPT (1024), EETQ_PROF_A8 (0|1: also time the W8A8
prefill GEMMs), EETQ_PROF_ITERS (20).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from eetq_tpu.models import PRESETS, init_caches
from eetq_tpu.modules.linear import linear_apply, quantize_linear
from eetq_tpu.ops import rmsnorm

CFG = PRESETS["llama2-7b"]
B = 1
BF16_PEAK = 197e12
INT8_PEAK = 394e12


def _fetch(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0])


_SYNC = [0.0]


def measure_sync():
    f = jax.jit(lambda x: x + 1)
    xs = jnp.ones((8,), jnp.float32)
    _fetch(f(xs))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _fetch(f(xs))
        ts.append(time.perf_counter() - t0)
    _SYNC[0] = min(ts)
    print(f"sync: {_SYNC[0]*1e3:.1f} ms", file=sys.stderr)


def bench(fn, *args, iters=None):
    iters = iters or int(os.environ.get("EETQ_PROF_ITERS", 20))

    @jax.jit
    def loop(*a):
        def body(i, c):
            return c + fn(c * 1e-30, *a)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    _fetch(loop(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _fetch(loop(*args))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - _SYNC[0], 1e-9) / iters


def main():
    p = int(os.environ.get("EETQ_PROF_PROMPT", 1024))
    measure_sync()
    h, hd, hkv, d = (
        CFG.hidden_size, CFG.num_heads, CFG.num_kv_heads, CFG.head_dim,
    )
    inter, v = CFG.intermediate_size, CFG.vocab_size
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (B, p, h), jnp.bfloat16)
    x_o = jax.random.normal(ks[5], (B, p, hd * d), jnp.bfloat16)
    x_i = jax.random.normal(ks[6], (B, p, inter), jnp.bfloat16)

    mk = lambda k, kin, kout: quantize_linear(
        jax.random.normal(k, (kin, kout), jnp.float32) * kin**-0.5
    )
    qkv = mk(ks[1], h, (hd + 2 * hkv) * d)
    o = mk(ks[2], hd * d, h)
    gu = mk(ks[3], h, 2 * inter)
    dn = mk(ks[4], inter, h)
    lm = mk(ks[7], h, v)
    gamma = jnp.ones((h,), jnp.float32)

    def t_lin(layer, xin, a8=False):
        def f(c, xin):
            return linear_apply(layer, xin + c, a8=a8).mean().astype(
                jnp.float32
            )

        return bench(f, xin)

    def t_attn(c, x):
        from eetq_tpu.modules.attention import attention

        q = (x + c)[..., : hd * d].reshape(B, p, hd, d)
        kv = (x + c)[..., : hkv * d].reshape(B, p, hkv, d)
        out, _ = attention(q, kv, kv, None, 0)
        return out.mean().astype(jnp.float32)

    def t_norm(c, x):
        return rmsnorm(x + c, gamma).mean().astype(jnp.float32)

    gemms = {
        # name: (layer, x, m, k, n)
        "qkv": (qkv, x, p, h, (hd + 2 * hkv) * d),
        "o_proj": (o, x_o, p, hd * d, h),
        "gateup": (gu, x, p, h, 2 * inter),
        "down": (dn, x_i, p, inter, h),
        "lm_head(int8)": (lm, x, p, h, v),
    }
    rows = []
    total_gemm = 0.0
    for name, (layer, xin, m, kk_, n) in gemms.items():
        t = t_lin(layer, xin)
        tf = 2 * m * kk_ * n / t / 1e12
        pct = 100 * tf * 1e12 / BF16_PEAK
        rows.append((name, t, tf, pct))
        if name != "lm_head(int8)":
            total_gemm += t
    t_att = bench(t_attn, x)
    t_nrm = bench(t_norm, x)

    print(f"\nprefill components, llama2-7b W8A16, B={B} S={p} (v5e):")
    print(f"{'component':18s} {'time':>10s} {'TF/s':>8s} {'%bf16 peak':>10s}")
    for name, t, tf, pct in rows:
        print(f"{name:18s} {t*1e3:9.3f}ms {tf:8.1f} {pct:9.1f}%")
    print(f"{'flash attention':18s} {t_att*1e3:9.3f}ms")
    print(f"{'rmsnorm':18s} {t_nrm*1e3:9.3f}ms")
    per_layer = total_gemm + t_att + 2 * t_nrm
    head = rows[-1][1]
    proj = per_layer * CFG.num_layers + head
    print(f"{'per-layer sum':18s} {per_layer*1e3:9.3f}ms")
    print(f"{'projected prefill':18s} {proj*1e3:9.1f}ms "
          f"({CFG.num_layers} layers + head)")

    if os.environ.get("EETQ_PROF_A8", "0") == "1":
        print("\nW8A8 (int8-activation) prefill GEMMs:")
        for name, (layer, xin, m, kk_, n) in gemms.items():
            t = t_lin(layer, xin, a8=True)
            tf = 2 * m * kk_ * n / t / 1e12
            print(f"{name:18s} {t*1e3:9.3f}ms {tf:8.1f} TF/s "
                  f"({100*tf*1e12/INT8_PEAK:5.1f}% of int8 peak)")

    # the honest end-to-end number: the production prefill path
    from bench import build_params
    from eetq_tpu.serve.generate import prefill

    params = build_params(CFG, quantized=True)
    prompt = jnp.ones((B, p), jnp.int32)
    logits, _ = prefill(params, CFG, prompt, init_caches(CFG, B, p + 64))
    _fetch(logits)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        logits, _ = prefill(params, CFG, prompt, init_caches(CFG, B, p + 64))
        _fetch(logits)
        ts.append(time.perf_counter() - t0)
    e2e = min(ts) - _SYNC[0]
    # head term is 1 row, not p: production prefill computes the lm_head
    # at the last position only (transformer.forward_inner last_only)
    flops = 2 * p * CFG.num_layers * (
        h * (hd + 2 * hkv) * d + hd * d * h + h * 2 * inter + inter * h
    ) + 2 * h * v
    print(f"\nend-to-end prefill (production path): {e2e*1e3:.1f} ms "
          f"= {flops/e2e/1e12:.1f} TF/s "
          f"({100*flops/e2e/BF16_PEAK:.1f}% of bf16 peak)")


if __name__ == "__main__":
    main()
