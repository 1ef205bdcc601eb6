"""Mixture-of-Experts MLP over quantized expert banks (Mixtral-style).

The reference carries 3-D "num_experts" batched quantization end to end
(`fpA_intB_gemm_wrapper.cu:44-66`, `cutlass_preprocessors.cc:594-614`,
MoE-aware layout traits `mixed_gemm_B_layout.h:1-4`) but hardcodes
num_experts=1 in its GEMM runner and ships no router — the infrastructure
without the runtime. This module is the runtime, TPU-native:

- experts live as ONE stacked [E, K, N] quantized bank (a 3-D PackedWeight —
  the layout the quantizer/native preprocessor already produce);
- routing is a top-k softmax over a small bf16 router linear;
- **decode** (few tokens) runs `ops.moe.w8a16_expert_matmul`: expert ids are
  scalar-prefetched into the Pallas grid, so HBM streams exactly the
  selected experts' tiles — top-2-of-8 decode moves 1/4 of the bank's
  bytes, the bandwidth-optimal figure for routed decode;
- **prefill** (many tokens) runs a `lax.scan` over experts: every expert's
  tiles stream once while all tokens' partial outputs are masked by the
  routing weights (dense-masked combine — exact, static shapes, MXU-shaped;
  the E/k FLOP overhead is the classic static-shape MoE tradeoff and
  prefill is MXU-rich);
- **expert parallelism**: under shard_map the local bank holds E/p experts;
  prefill takes the routed grouped path per shard when k < E/p (non-local
  selections park on local expert 0 with a zero combine weight) and the
  masked scan otherwise; the decoder's existing row-parallel psum completes
  the combine (see models.transformer.decoder_layer).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

from eetq_tpu.kernels.autotune import MAX_DECODE_M
from eetq_tpu.kernels.w8a16 import w8a16_matmul_ref
from eetq_tpu.layout import unpack_weights
from eetq_tpu.modules.linear import DenseLinear, QuantLinear
from eetq_tpu.ops.moe import w8a16_expert_matmul, w8a16_grouped_matmul
from eetq_tpu.quant import symmetric_quantize

_ACT = {"silu": jax.nn.silu, "gelu": jax.nn.gelu, "relu": jax.nn.relu}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MoEMLP:
    """Routed MLP block: router [H, E] + stacked expert gate/up and down.

    gateup/down are QuantLinear (3-D PackedWeight data [E, Kp, Np], scales
    [E, N] or [E, G, N]) or DenseLinear (3-D weight [E, K, N], bf16)."""

    router: DenseLinear  # weight [H, E]
    gateup: QuantLinear | DenseLinear  # [E, H, 2I]
    down: QuantLinear | DenseLinear  # [E, I, H]

    @property
    def num_local_experts(self) -> int:
        w = (
            self.gateup.qweight.data
            if isinstance(self.gateup, QuantLinear)
            else self.gateup.weight
        )
        return w.shape[0]


def quantize_moe(
    moe: MoEMLP, bits: int = 8, group_size: int | None = None
) -> MoEMLP:
    """Quantize a dense MoEMLP's expert banks (router stays bf16 — it is a
    [H, E] sliver whose logits decide routing; quantizing it risks flipped
    top-k picks for ~zero bytes saved)."""
    from eetq_tpu.layout import pack_weights

    def q(lin: DenseLinear) -> QuantLinear:
        if lin.bias is not None:
            raise NotImplementedError("expert biases not supported")
        qw, s = symmetric_quantize(lin.weight, bits=bits, group_size=group_size)
        return QuantLinear(qweight=pack_weights(qw, bits=bits), scales=s)

    return MoEMLP(router=moe.router, gateup=q(moe.gateup), down=q(moe.down))


def route(
    router: DenseLinear, x2: jax.Array, top_k: int
) -> tuple[jax.Array, jax.Array]:
    """Top-k routing: softmax over the selected logits (the Mixtral
    convention — normalize AFTER top-k). x2 [T, H] -> (weights [T, k] f32,
    ids [T, k] int32)."""
    logits = jnp.dot(
        x2, router.weight.astype(x2.dtype), preferred_element_type=jnp.float32
    )
    topv, topi = jax.lax.top_k(logits, top_k)
    topw = jax.nn.softmax(topv, axis=-1)
    return topw, topi.astype(jnp.int32)


def _gated(gu_out: jax.Array, activation: str, dtype) -> jax.Array:
    gate, up = jnp.split(gu_out, 2, axis=-1)
    return (
        _ACT[activation](gate.astype(jnp.float32)) * up.astype(jnp.float32)
    ).astype(dtype)


def _grouped_bm(n_sel: int, e: int) -> int:
    """Row-block size for the grouped prefill GEMM. 128 keeps the weight
    stream compute-bound on the MXU (2*bm flops per int8 weight byte needs
    bm >= ~120 at v5e's 197 TF/s / 819 GB/s); smaller prefills shrink bm
    toward the balanced per-expert count so padding blocks stay bounded
    (total blocks <= n_sel/bm + E, one partial block per expert).

    EETQ_MOE_GROUPED_BM overrides (trace-time, like the other MoE knobs)
    for on-hardware block-size A/Bs (scripts/bench_moe.py)."""
    env = os.environ.get("EETQ_MOE_GROUPED_BM")
    if env:
        return int(env)
    per = n_sel // max(e, 1)
    return max(8, min(128, 8 * (per // 8) or 8))


def moe_grouped_combine(
    moe: MoEMLP,
    x2: jax.Array,  # [T, H]
    topw: jax.Array,  # [T, k] f32
    topi: jax.Array,  # [T, k] int32 (GLOBAL expert ids)
    activation: str,
    interpret: bool | None = None,
    tp_axis: str | None = None,
) -> jax.Array:
    """Routed MoE prefill: token-grouped expert GEMM (MegaBlocks-style,
    static shapes). Sort the (token, expert) selections by expert, pack
    their activation rows into per-expert contiguous bm-row blocks, run
    ONE grouped kernel per projection (each block's weight tiles are the
    scalar-prefetched expert's), then un-sort and combine with the routing
    weights. FLOPs are the ROUTED k/E fraction (+ <=1 padding block per
    expert) instead of the masked scan's all-E dense compute — the prefill
    counterpart of the decode gather's bandwidth win.

    Under EP (tp_axis set, local E/p bank): selections routed to OTHER
    shards' experts keep their rows (static shapes demand worst-case
    capacity) but compute against local expert 0 with a ZERO combine
    weight, and the caller's psum completes the cross-shard sum. The
    per-shard row count is therefore T*k regardless of p — cheaper than
    the masked scan's T*E/p rows exactly when k < E/p (the caller gates
    on that).

    Returns [T, H] f32 (caller casts / reshapes)."""
    t, h = x2.shape
    top_k = topi.shape[-1]
    e = moe.num_local_experts
    n_sel = t * top_k
    bm = _grouped_bm(n_sel, e)
    nb = n_sel // bm + e  # static: <=1 partial block per expert

    eids = topi.reshape(-1)  # [S] global
    wflat = topw.reshape(-1)
    if tp_axis is not None:
        off = jax.lax.axis_index(tp_axis) * e
        local = (eids >= off) & (eids < off + e)
        # non-local selections: park on local expert 0 with zero weight
        eids = jnp.where(local, eids - off, 0).astype(jnp.int32)
        wflat = jnp.where(local, wflat, 0.0)
    order = jnp.argsort(eids, stable=True)  # sorted-selection -> selection
    e_sorted = eids[order]
    tok_sorted = order // top_k
    counts = jnp.sum(
        jax.nn.one_hot(eids, e, dtype=jnp.int32), axis=0
    )  # [E]
    group_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    nb_e = -(-counts // bm)  # ceil: blocks per expert
    cum_nb = jnp.cumsum(nb_e)
    block_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), cum_nb[:-1]]
    )
    blk = jnp.arange(nb, dtype=jnp.int32)
    # block b belongs to the expert whose [block_start, block_start+nb_e)
    # covers it; padding blocks past cum_nb[-1] clamp to a valid id (their
    # rows are zero and never gathered back)
    block_expert = jnp.minimum(
        jnp.searchsorted(cum_nb, blk, side="right").astype(jnp.int32), e - 1
    )
    pos = jnp.arange(n_sel, dtype=jnp.int32) - group_start[e_sorted]
    dest = block_start[e_sorted] * bm + pos  # [S] row in the packed buffer

    xg = jnp.zeros((nb * bm, h), x2.dtype).at[dest].set(x2[tok_sorted])
    gu = w8a16_grouped_matmul(
        xg, moe.gateup.qweight, moe.gateup.scales, block_expert,
        interpret=interpret,
    )
    hidden = _gated(gu, activation, x2.dtype)
    dn = w8a16_grouped_matmul(
        hidden, moe.down.qweight, moe.down.scales, block_expert,
        interpret=interpret,
    )
    contrib_sorted = dn[dest]  # [S, H] in sorted-selection order
    # un-sort (scatter-set via the inverse permutation), then the weighted
    # per-token sum over k in the ORIGINAL top-k order
    contrib = (
        jnp.zeros_like(contrib_sorted).at[order].set(contrib_sorted)
    ).astype(jnp.float32)
    return jnp.sum(
        contrib.reshape(t, top_k, h)
        * wflat.reshape(t, top_k)[..., None].astype(jnp.float32),
        axis=1,
    )


def moe_apply(
    moe: MoEMLP,
    x: jax.Array,
    top_k: int,
    activation: str = "silu",
    tp_axis: str | None = None,
    interpret: bool | None = None,
    use_kernel: bool = True,
) -> jax.Array:
    """Routed MLP forward. x [B, S, H] (already normed) -> [B, S, H].

    Under expert parallelism (tp_axis set, inside shard_map) the banks hold
    the LOCAL E/p experts; the return value is this shard's partial combine
    and the caller psums it (same contract as the row-parallel down proj).
    """
    b, s, h = x.shape
    t = b * s
    x2 = x.reshape(t, h)
    quantized = isinstance(moe.gateup, QuantLinear)

    topw, topi = route(moe.router, x2, top_k)  # [T, k]

    e_local = moe.num_local_experts
    n_sel = t * top_k
    gather_ok = (
        quantized
        and use_kernel
        and tp_axis is None
        and n_sel <= min(MAX_DECODE_M, e_local)
        # TRACE-TIME A/B knob (like EETQ_FUSED_MLP): read when the calling
        # jit first traces — flipping it in-process after jit caching has
        # no effect. Forces the masked-scan path at decode shapes (streams
        # ALL experts' bytes); scripts/bench_moe.py uses it to measure the
        # gather path's bandwidth win on hardware.
        and os.environ.get("EETQ_MOE_NO_GATHER", "0") != "1"
    )
    grouped_ok = (
        quantized
        and use_kernel
        and not gather_ok
        and n_sel > MAX_DECODE_M
        # Under EP every shard still packs T*k selection rows (non-local
        # ones park on local expert 0 with zero weight — static shapes);
        # the masked scan computes T*E_local rows per shard, so grouped
        # only wins when k < E_local. tp=4 Mixtral (E_local=2=k) keeps the
        # scan; tp=2 (E_local=4) takes the routed path.
        and (tp_axis is None or top_k < e_local)
        # trace-time A/B knob: force the masked scan (all-E dense FLOPs)
        # at prefill shapes — scripts/bench_moe.py measures the routed win
        and os.environ.get("EETQ_MOE_NO_GROUPED", "0") != "1"
        and os.environ.get("EETQ_MOE_NO_GATHER", "0") != "1"
    )
    if grouped_ok:
        # Prefill regime: token-grouped expert GEMM — routed k/E FLOPs
        out2 = moe_grouped_combine(
            moe, x2, topw, topi, activation, interpret=interpret,
            tp_axis=tp_axis,
        )
        return out2.astype(x.dtype).reshape(b, s, h)
    if gather_ok:
        # Decode regime: one scalar-prefetched kernel per projection streams
        # exactly the selected experts' weight tiles.
        eids = topi.reshape(-1)
        sel = jnp.arange(n_sel)
        tok = sel // top_k
        gu_sel = w8a16_expert_matmul(
            x2, moe.gateup.qweight, moe.gateup.scales, eids,
            interpret=interpret,
        )  # [n_sel, T, 2I]
        hidden = _gated(gu_sel[sel, tok], activation, x2.dtype)  # [n_sel, I]
        dn_sel = w8a16_expert_matmul(
            hidden, moe.down.qweight, moe.down.scales, eids,
            interpret=interpret,
        )  # [n_sel, n_sel, H]
        dn_rows = dn_sel[sel, sel].astype(jnp.float32)  # [n_sel, H]
        out2 = jnp.sum(
            dn_rows.reshape(t, top_k, h) * topw[..., None], axis=1
        )
        return out2.astype(x.dtype).reshape(b, s, h)

    # Dense-masked scan over (local) experts: coeff[t, e] = routing weight
    # if expert e was picked for token t else 0. Exact for any T.
    e_global = (
        moe.router.weight.shape[-1]
    )
    coeff = jnp.sum(
        jax.nn.one_hot(topi, e_global, dtype=jnp.float32) * topw[..., None],
        axis=-2,
    )  # [T, E_global]
    if tp_axis is not None and e_local != e_global:
        off = jax.lax.axis_index(tp_axis) * e_local
        coeff = jax.lax.dynamic_slice(coeff, (0, off), (t, e_local))
        local_ids = jnp.arange(e_local, dtype=jnp.int32)  # bank-local
    else:
        local_ids = jnp.arange(e_local, dtype=jnp.int32)
    coeff_t = coeff.T  # [E_local, T]

    if quantized and use_kernel:
        gu_q, gu_s = moe.gateup.qweight, moe.gateup.scales
        dn_q, dn_s = moe.down.qweight, moe.down.scales

        def body(acc, ec):
            eidx, c = ec
            g_out = w8a16_expert_matmul(
                x2, gu_q, gu_s, eidx[None], interpret=interpret
            )[0]
            hidden = _gated(g_out, activation, x2.dtype)
            d_out = w8a16_expert_matmul(
                hidden, dn_q, dn_s, eidx[None], interpret=interpret
            )[0]
            return acc + c[:, None] * d_out.astype(jnp.float32), None

        xs = (local_ids, coeff_t)
    elif quantized:
        gu_logical = unpack_weights(moe.gateup.qweight)
        dn_logical = unpack_weights(moe.down.qweight)

        def body(acc, xs_):
            wg, sg, wd, sd, c = xs_
            g_out = w8a16_matmul_ref(x2, wg, sg).astype(x2.dtype)
            hidden = _gated(g_out, activation, x2.dtype)
            d_out = w8a16_matmul_ref(hidden, wd, sd)
            return acc + c[:, None] * d_out.astype(jnp.float32), None

        xs = (gu_logical, moe.gateup.scales, dn_logical, moe.down.scales,
              coeff_t)
    else:

        def body(acc, xs_):
            wg, wd, c = xs_
            g_out = jnp.dot(x2, wg.astype(x2.dtype))
            hidden = _gated(g_out, activation, x2.dtype)
            d_out = jnp.dot(hidden, wd.astype(hidden.dtype))
            return acc + c[:, None] * d_out.astype(jnp.float32), None

        xs = (moe.gateup.weight, moe.down.weight, coeff_t)

    out2, _ = jax.lax.scan(body, jnp.zeros((t, h), jnp.float32), xs)
    return out2.astype(x.dtype).reshape(b, s, h)
