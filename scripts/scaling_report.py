"""Multi-chip scaling estimate (BASELINE ">= 85% scaling" line, VERDICT r2
item 9): bytes-over-ICI vs compute per decode step, from the roofline data
and the sharded program's collective census.

Multi-chip hardware isn't available in this environment, so the claim is
made INSPECTABLE instead of measured: the analytic model's collective
counts (2 psums/layer + 1 lm_head all-gather) are asserted against the
real sharded program's jaxpr in tests/test_profiling.py, and the per-step
arithmetic below can be rechecked by hand.

Usage: python scripts/scaling_report.py [--preset llama2-7b]
       [--t1-ms 10.2]   # measured single-chip decode step, anchors the model
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="llama2-7b")
    ap.add_argument("--t1-ms", type=float, default=None,
                    help="measured single-chip ms/step (e.g. 10.2 for "
                         "llama2-7b W8A16 r2); default: HBM roofline")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--bits", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # analytic — no TPU needed

    from eetq_tpu.models import PRESETS
    from eetq_tpu.utils.profiling import tp_decode_scaling

    cfg = PRESETS[args.preset]
    defaults = {"llama2-7b": 10.2, "llama2-13b": 20.7}
    t1 = args.t1_ms if args.t1_ms is not None else defaults.get(args.preset)

    print(f"{args.preset} decode-step TP scaling model "
          f"(batch={args.batch}, seq={args.seq}, W{args.bits}A16"
          + (f", anchored to measured {t1} ms/step" if t1 else
             ", HBM-roofline anchored") + "):")
    print("| tp | step ms | HBM ms | ICI ms | ICI MB/step | speedup | efficiency |")
    print("|---|---|---|---|---|---|---|")
    for tp in (1, 2, 4, 8, 16):
        e = tp_decode_scaling(cfg, tp, batch=args.batch, seq=args.seq,
                              bits=args.bits, measured_t1_ms=t1)
        print(f"| {tp} | {e.t_tp_ms:.2f} | {e.t_hbm_ms:.2f} | "
              f"{e.t_ici_ms:.3f} | {e.ici_bytes_per_step/1e6:.2f} | "
              f"{e.speedup:.2f}x | {e.efficiency:.0%} |")
    print()
    print("DP weak scaling (one replica per chip/host, batch grows with "
          "chips): decode has NO cross-replica collectives, so aggregate "
          "tok/s scales at ~100% minus load imbalance — this is the "
          "serving configuration the >=85% BASELINE line describes. The "
          "TP table above is the STRONG-scaling (fixed batch) price of "
          "fitting a bigger model: per-step ICI bytes and 2(tp-1)-hop "
          "latency per collective are the exact terms.")

    from eetq_tpu.utils.profiling import pp_decode_scaling

    print()
    print(f"{args.preset} pipeline-parallel decode (token ring, "
          f"dist/pipeline.py; pp microbatches of batch={args.batch} in "
          "flight; ~100 Gb/s 25 us DCN link — PP is the axis to put "
          "ACROSS hosts, its per-boundary payload is one activation):")
    print("| pp | tick ms | stage ms | link ms | throughput | efficiency "
          "| token latency |")
    print("|---|---|---|---|---|---|---|")
    for pp in (2, 4, 8):
        e = pp_decode_scaling(cfg, pp, batch=args.batch, bits=args.bits,
                              measured_t1_ms=t1)
        print(f"| {pp} | {e.t_tick_ms:.2f} | {e.t_stage_ms:.2f} | "
              f"{e.t_link_ms:.3f} | {e.throughput_speedup:.2f}x | "
              f"{e.efficiency:.0%} | {e.latency_x:.2f}x |")
    print()
    print("Weak scaling: total live batch grows with pp (one microbatch "
          "per stage), so throughput scales like DP while each device "
          "holds only 1/pp of the weights; per-token latency pays the "
          "pipeline depth. At FIXED total batch PP gains nothing at "
          "decode — TP covers that regime (table above).")


if __name__ == "__main__":
    main()
