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


def run(batch: int, bits: int | None) -> dict:
    env = dict(os.environ, EETQ_BENCH_BATCH=str(batch))
    if bits is not None:
        env["EETQ_BENCH_BITS"] = str(bits)
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=ROOT, env=env,
        capture_output=True, text=True, timeout=900,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    stats = {}
    for l in out.stderr.splitlines():
        if l.startswith(("bf16:", "w8a16:")):
            key = l.split(":")[0]
            stats[key] = eval(l.split(":", 1)[1].strip())
    return {"json": json.loads(line), **stats}


def main():
    rows = []
    for batch in (1, 2, 4):
        r8 = run(batch, 8)
        r4 = run(batch, 4)
        rows.append(
            (
                batch,
                r8["bf16"]["decode_tok_s"],
                r8["w8a16"]["decode_tok_s"],
                r4["w8a16"]["decode_tok_s"],
            )
        )
        print(f"done batch={batch}", file=sys.stderr)
    print("| batch | bf16 tok/s | W8A16 tok/s (x) | W4A16 tok/s (x) |")
    print("|---|---|---|---|")
    for b, bf, w8, w4 in rows:
        print(
            f"| {b} | {bf:.1f} | {w8:.1f} ({w8/bf:.2f}x) | "
            f"{w4:.1f} ({w4/bf:.2f}x) |"
        )


if __name__ == "__main__":
    main()
