from eetq_tpu.serve.generate import generate, greedy_generate
from eetq_tpu.serve.eval import delta_ppl, perplexity
from eetq_tpu.serve.engine import Engine, Request
from eetq_tpu.serve.spec import ngram_spec_generate, spec_generate
from eetq_tpu.serve.api import EngineServer

__all__ = [
    "generate",
    "greedy_generate",
    "perplexity",
    "delta_ppl",
    "Engine",
    "Request",
    "spec_generate",
    "ngram_spec_generate",
    "EngineServer",
]
