from eetq_tpu.serve.generate import generate, greedy_generate
from eetq_tpu.serve.eval import delta_ppl, perplexity

__all__ = ["generate", "greedy_generate", "perplexity", "delta_ppl"]
