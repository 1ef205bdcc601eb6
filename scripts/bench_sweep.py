"""Batch sweep mirroring the reference's published chart
(`README.md:109-113`: llama-13b on 3090, prompt=1024, max_new_tokens=50,
batch 1/2/4) — here llama2-7b on one TPU v5e chip, W8A16 and W4A16 vs bf16.

Run from the repo root: python scripts/bench_sweep.py
Writes a markdown table to stdout.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")


def run(batch: int, bits: int | None, skip_bf16: bool = False) -> dict:
    # the sweep covers batches; the 13B estimate is bench.py's own default
    # extra and would rebuild three models per invocation here
    env = dict(os.environ, EETQ_BENCH_BATCH=str(batch), EETQ_BENCH_13B="0")
    if bits is not None:
        env["EETQ_BENCH_BITS"] = str(bits)
    if skip_bf16:
        env["EETQ_BENCH_SKIP_BF16"] = "1"
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=ROOT, env=env,
        capture_output=True, text=True, timeout=1500,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(out.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"bench failed (batch={batch}, bits={bits})")
    line = lines[-1]
    stats = {}
    for l in out.stderr.splitlines():
        if l.startswith(("bf16:", "w8a16:")):
            key = l.split(":")[0]
            stats[key] = eval(l.split(":", 1)[1].strip())
    return {"json": json.loads(line), **stats}


def main():
    rows = []
    for batch in (1, 2, 4):
        # bf16 llama2-7b OOMs one 16 GB v5e chip at batch >= 2 (13.5 GB
        # weights + caches + prefill activations) — quantization is what
        # makes those batches possible at all.
        skip_bf16 = batch > 1
        r8 = run(batch, 8, skip_bf16)
        r4 = run(batch, 4, skip_bf16)
        bf = None if skip_bf16 else r8["bf16"]["decode_tok_s"]
        rows.append(
            (batch, bf, r8["w8a16"]["decode_tok_s"], r4["w8a16"]["decode_tok_s"])
        )
        print(f"done batch={batch}", file=sys.stderr)
    print("| batch | bf16 tok/s | W8A16 tok/s | W4A16 tok/s |")
    print("|---|---|---|---|")
    for b, bf, w8, w4 in rows:
        bf_s = f"{bf:.1f}" if bf else "OOM (16 GB)"
        x8 = f" ({w8/bf:.2f}x)" if bf else ""
        x4 = f" ({w4/bf:.2f}x)" if bf else ""
        print(f"| {b} | {bf_s} | {w8:.1f}{x8} | {w4:.1f}{x4} |")


if __name__ == "__main__":
    main()
