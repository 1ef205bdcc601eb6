from eetq_tpu.serve.generate import generate, greedy_generate

__all__ = ["generate", "greedy_generate"]
