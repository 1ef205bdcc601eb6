"""Decompose the llama2-7b W8A16 decode step cost on the real TPU.

Times each component class in an on-device fori_loop (single dispatch,
relay-latency-proof): the 4 quantized matmuls, decode attention incl. cache
update, rmsnorm+rope glue, lm_head, and the full decoder layer. Prints a
per-step budget vs the measured end-to-end step time.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from eetq_tpu.models import PRESETS, init_caches
from eetq_tpu.modules.attention import attention
from eetq_tpu.modules.linear import quantize_linear, linear_apply
from eetq_tpu.ops import make_cos_sin_cache, rmsnorm, rope

CFG = PRESETS["llama2-7b"]
B = 1
CTX = 1024
ITERS = 200


def _fetch(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0])


_SYNC = [0.0]


def bench(fn, *args, iters=ITERS):
    """fn(carry_scalar, *args) -> scalar; timed in one fori_loop dispatch,
    host-sync overhead subtracted."""

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


def main():
    measure_sync()
    h, hd, hkv, d = CFG.hidden_size, CFG.num_heads, CFG.num_kv_heads, CFG.head_dim
    inter = CFG.intermediate_size
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (B, 1, h), jnp.bfloat16)

    mk = lambda k, kin, kout: quantize_linear(
        jax.random.normal(k, (kin, kout), jnp.float32) * kin**-0.5
    )
    qkv = mk(ks[1], h, (hd + 2 * hkv) * d)
    o = mk(ks[2], hd * d, h)
    gu = mk(ks[3], h, 2 * inter)
    dn = mk(ks[4], inter, h)
    lm = jax.random.normal(ks[5], (h, CFG.vocab_size), jnp.bfloat16)
    gamma = jnp.ones((h,), jnp.float32)
    cos_sin = make_cos_sin_cache(CFG.max_position, CFG.rot_dim, base=CFG.rope_theta)
    cache = init_caches(CFG, B, CTX + 64)[0]
    kq = jax.random.normal(ks[6], (B, 1, hd, d), jnp.bfloat16)
    kk = jax.random.normal(ks[7], (B, 1, hkv, d), jnp.bfloat16)

    def t_matmuls(c, x):
        y = x + c
        a = linear_apply(qkv, y)
        b = linear_apply(o, y[..., : hd * d] if hd * d <= h else jnp.pad(y, ((0,0),(0,0),(0, hd*d-h))))
        g = linear_apply(gu, y)
        e = linear_apply(dn, g[..., :inter])
        return (a.mean() + b.mean() + e.mean()).astype(jnp.float32)

    def t_attn(c, kq, kk, cache):
        q = kq + c
        out, cache2 = attention(q, kk, kk, cache, jnp.int32(CTX))
        return out.mean().astype(jnp.float32)

    def t_glue(c, x):
        y = rmsnorm(x + c, gamma)
        q = rope(kq, jnp.full((B, 1), CTX, jnp.int32), cos_sin)
        y2 = rmsnorm(x + q.mean(), gamma)
        return (y.mean() + y2.mean()).astype(jnp.float32)

    def t_lm_head(c, x):
        y = jnp.dot((x + c)[:, 0], lm, preferred_element_type=jnp.float32)
        return y.mean()

    def t_one(layer):
        def f(c, x):
            return linear_apply(layer, x + c).mean().astype(jnp.float32)
        return f

    r = {}
    r["qkv alone"] = bench(t_one(qkv), x)
    r["o alone"] = bench(t_one(o), jax.random.normal(ks[0], (B, 1, hd * d), jnp.bfloat16))
    r["gateup alone"] = bench(t_one(gu), x)
    r["down alone"] = bench(t_one(dn), jax.random.normal(ks[0], (B, 1, inter), jnp.bfloat16))
    r["matmuls(qkv+o+gateup+down)"] = bench(t_matmuls, x)
    r["attention(update+decode)"] = bench(t_attn, kq, kk, cache)
    r["glue(2x rmsnorm + rope)"] = bench(t_glue, x)
    r["lm_head(bf16 dense)"] = bench(t_lm_head, x)

    per_layer = (
        r["matmuls(qkv+o+gateup+down)"]
        + r["attention(update+decode)"]
        + r["glue(2x rmsnorm + rope)"]
    )
    total = per_layer * CFG.num_layers + r["lm_head(bf16 dense)"]
    for k, v in r.items():
        print(f"{k:34s}: {v*1e6:8.1f} us")
    print(f"{'per-layer sum':34s}: {per_layer*1e6:8.1f} us")
    print(f"{'projected step (32 layers+head)':34s}: {total*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
