"""Delta-perplexity acceptance run (BASELINE.md: WikiText-2 ΔPPL <= 0.1).

Usage:
  python scripts/eval_ppl.py --model PATH [--tokens tokens.npy]
                             [--window 2048] [--bits 8] [--group-size G]

--model: an HF checkpoint directory (fp16/bf16 weights). The script loads
  the dense model, quantizes a copy, and reports PPL for both + the delta.
--tokens: a .npy int32 array of token ids (e.g. WikiText-2 test tokenized
  with the model's tokenizer; this environment is zero-egress so tokens
  must be provided as a file). Without it, a deterministic synthetic stream
  is used — useful only as a plumbing smoke test, not an accuracy claim.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--tokens", default=None)
    ap.add_argument("--window", type=int, default=2048)
    ap.add_argument("--bits", type=int, default=8)
    ap.add_argument("--group-size", type=int, default=None)
    args = ap.parse_args()

    from eetq_tpu.models import quantize_params
    from eetq_tpu.models.hf import load_hf_dense
    from eetq_tpu.serve.eval import delta_ppl
    from eetq_tpu.surgery.quantize import eet_quantize

    cfg, dense = load_hf_dense(args.model)
    quant = eet_quantize(dense, bits=args.bits, group_size=args.group_size)

    if args.tokens:
        ids = np.load(args.tokens).astype(np.int32)
    else:
        print("WARNING: no --tokens; using a synthetic stream (plumbing "
              "check only)", file=sys.stderr)
        ids = np.random.default_rng(0).integers(
            0, cfg.vocab_size, size=16 * args.window
        )

    r = delta_ppl(dense, quant, cfg, ids, window=args.window)
    print(f"dense PPL:  {r['ppl_dense']:.4f}")
    print(f"quant PPL:  {r['ppl_quant']:.4f}  (bits={args.bits}, "
          f"group_size={args.group_size})")
    print(f"delta PPL:  {r['delta_ppl']:+.4f}")
    target = 0.1
    verdict = "PASS" if r["delta_ppl"] <= target else "FAIL"
    print(f"BASELINE target delta <= {target}: {verdict}")


if __name__ == "__main__":
    main()
