"""Profiling/roofline utility tests (CPU: API + math, not absolute perf)."""

import jax.numpy as jnp
import numpy as np

from eetq_tpu.utils.profiling import (
    RooflineReport,
    device_time,
    host_sync_overhead,
    roofline,
)


def test_roofline_memory_bound():
    # 1 GB moved in 2 ms -> 500 GB/s; trivial flops -> memory bound
    r = roofline(2e-3, 10**9, 10**6)
    assert r.bound == "memory"
    assert r.achieved_gbs == 500.0
    assert 0 < r.fraction_of_roof <= 1.0
    assert "GB/s" in str(r)


def test_roofline_compute_bound():
    # 10 TFLOP in 100 ms with tiny bytes -> compute bound
    r = roofline(0.1, 10**6, 10**13)
    assert r.bound == "compute"
    assert r.achieved_tflops == 100.0


def test_device_time_measures_something():
    x = jnp.ones((64, 64), jnp.float32)

    def f(c, x):
        return jnp.sum((x + c) @ x)

    t = device_time(f, x, iters=20, reps=2, sync_s=0.0)
    assert t > 0


def test_host_sync_overhead_positive():
    assert host_sync_overhead(reps=2) > 0


def test_count_collectives_matches_model():
    """The analytic scaling model assumes 2 psums/layer + 1 lm_head
    all-gather per forward — assert that census against the REAL sharded
    program's jaxpr (VERDICT r2 item 9: make the arithmetic inspectable)."""
    import jax

    from eetq_tpu.dist import make_mesh, shard_model
    from eetq_tpu.dist.sharding import make_forward_fn
    from eetq_tpu.models import ModelConfig, init_caches, random_dense_params
    from eetq_tpu.utils.profiling import count_collectives

    cfg = ModelConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=8, num_kv_heads=4, head_dim=16, max_position=32,
    )
    dense = random_dense_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    mesh = make_mesh(tp=4, dp=1)
    model = shard_model(dense, cfg, mesh, quantize=False)
    fwd = make_forward_fn(model, use_flash=False)
    toks = jnp.zeros((1, 4), jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    caches = init_caches(cfg, 1, 8, dtype=jnp.float32)

    counts = count_collectives(
        lambda p, t, q, c: fwd(p, t, q, c, jnp.int32(0)),
        model.params, toks, pos, caches,
    )
    psums = counts.get("psum_count", 0) + counts.get("psum2_count", 0)
    assert psums == 2 * cfg.num_layers, counts
    assert counts.get("all_gather_count", 0) == 1, counts


def test_tp_decode_scaling_model():
    """Scaling-estimate sanity: monotone ICI cost, efficiency in (0, 1],
    HBM time divides by tp, and the big-model case amortizes better."""
    from eetq_tpu.models.config import LLAMA2_7B, LLAMA2_70B
    from eetq_tpu.utils.profiling import tp_decode_scaling

    e2 = tp_decode_scaling(LLAMA2_7B, 2, measured_t1_ms=10.2)
    e4 = tp_decode_scaling(LLAMA2_7B, 4, measured_t1_ms=10.2)
    e8 = tp_decode_scaling(LLAMA2_7B, 8, measured_t1_ms=10.2)
    for e in (e2, e4, e8):
        assert 0 < e.efficiency <= 1
        assert e.speedup > 1
        assert e.t_hbm_ms < e.t_single_ms
    assert e2.ici_bytes_per_step < e4.ici_bytes_per_step < e8.ici_bytes_per_step
    assert e2.efficiency > e4.efficiency > e8.efficiency
    # 70B at tp=8 streams 8.5 GB/chip -> per-step HBM dominates and the
    # fixed overhead amortizes: efficiency must beat 7B's at the same tp
    e70 = tp_decode_scaling(LLAMA2_70B, 8)
    assert e70.efficiency > e8.efficiency
    assert e70.t_hbm_ms > 5.0  # ~68 GB / 8 chips / 819 GB/s


def test_pp_collective_census():
    """The PP model assumes ONE ring ppermute per decode tick (the
    activation+token payload) — assert it against the real pipelined
    program's jaxpr: exactly one ppermute inside the decode scan body
    (= total_ticks executions), and pp-1 boundary permutes in prefill."""
    import jax

    from eetq_tpu.dist import (
        init_pp_caches,
        make_pp_mesh,
        shard_model_pp,
    )
    from eetq_tpu.dist.pipeline import _pp_decode_jit, _pp_prefill_jit
    from eetq_tpu.models import ModelConfig, random_dense_params
    from eetq_tpu.utils.profiling import count_collectives

    cfg = ModelConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=8, num_kv_heads=4, head_dim=16, max_position=32,
    )
    dense = random_dense_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    mesh = make_pp_mesh(pp=2, tp=1, dp=1)
    model = shard_model_pp(dense, cfg, mesh, quantize=False)
    caches = init_pp_caches(model, 2, 16)
    first = jnp.zeros((2,), jnp.int32)
    key = jax.random.PRNGKey(0)

    counts = count_collectives(
        lambda p, f, c, k: _pp_decode_jit(
            model, p, f, jnp.int32(4), c, 3, 2, 0.0, 0, k
        ),
        model.params, first, caches, key,
    )
    # one ring transfer per tick, traced once inside the scan: the
    # (activation, token) tuple payload lowers to one ppermute per leaf
    # (2 eqns), and its total bytes are exactly the scaling model's
    # link_bytes term (mbs*h*2 bf16 activation + mbs*4 token), plus the
    # final out-buffer psum
    assert counts.get("ppermute_count", 0) == 2, counts
    mbs, h = 1, cfg.hidden_size
    assert counts.get("ppermute", 0) == mbs * h * 2 + mbs * 4, counts
    assert counts.get("psum_count", 0) + counts.get("psum2_count", 0) >= 1, counts

    caches2 = init_pp_caches(model, 2, 16)
    toks = jnp.zeros((2, 4), jnp.int32)
    counts_p = count_collectives(
        lambda p, t, c: _pp_prefill_jit(model, p, t, c, 2),
        model.params, toks, caches2,
    )
    assert counts_p.get("ppermute_count", 0) == 1, counts_p


def test_pp_decode_scaling_model():
    """PP weak-scaling estimate sanity: efficiency in (0, 1], latency
    multiplier >= 1, and bigger models amortize the link better."""
    from eetq_tpu.models.config import LLAMA2_7B, LLAMA2_70B
    from eetq_tpu.utils.profiling import pp_decode_scaling

    for pp in (2, 4, 8):
        e = pp_decode_scaling(LLAMA2_7B, pp, measured_t1_ms=10.0)
        assert 0 < e.efficiency <= 1.0, e
        assert e.latency_x >= 1.0, e
        assert abs(e.t_tick_ms - (e.t_stage_ms + e.t_link_ms)) < 1e-9
    small = pp_decode_scaling(LLAMA2_7B, 8, measured_t1_ms=10.0)
    big = pp_decode_scaling(LLAMA2_70B, 8, measured_t1_ms=84.0)
    assert big.efficiency > small.efficiency
