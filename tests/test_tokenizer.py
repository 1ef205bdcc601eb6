"""Dependency-free tokenizer.json BPE tokenizer: byte-level (gpt2/qwen2
style) and SentencePiece-style (llama/mistral) fixtures, plus the text
in/out HTTP path (`serve/api.py`) the reference's examples run through HF
AutoTokenizer (`examples/models/llama_transformers_example.py:40-76`)."""

import http.client
import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.serve.tokenizer import Tokenizer


# ---------------------------------------------------------------------------
# fixtures: tiny but structurally-faithful tokenizer.json specs
# ---------------------------------------------------------------------------


def _bytelevel_spec():
    """gpt2-style byte-level BPE: vocab = all 256 byte symbols + merges for
    'he', 'll', 'hell', 'hello', 'Ġw' ('Ġ' = byte-level space)."""
    from eetq_tpu.serve.tokenizer import _bytes_to_unicode

    b2u = _bytes_to_unicode()
    vocab = {c: i for i, c in enumerate(b2u[b] for b in range(256))}
    for tok in ["he", "ll", "hell", "hello", "Ġw", "Ġwo", "Ġwor"]:
        vocab[tok] = len(vocab)
    merges = ["h e", "l l", "he ll", "hell o", "Ġ w", "Ġw o", "Ġwo r"]
    vocab["<|end|>"] = len(vocab)
    return {
        "model": {"type": "BPE", "vocab": vocab, "merges": merges},
        "added_tokens": [
            {"id": vocab["<|end|>"], "content": "<|end|>", "special": True}
        ],
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": False},
        "decoder": {"type": "ByteLevel"},
    }


def _sentencepiece_spec():
    """llama-style BPE: Prepend/Replace normalizer, byte-fallback vocab,
    Sequence decoder (Replace ▁ -> space, ByteFallback, Fuse, Strip)."""
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for b in range(256):
        vocab[f"<0x{b:02X}>"] = len(vocab)
    for tok in ["▁", "h", "e", "l", "o", "w", "r", "d",
                "he", "ll", "hell", "hello", "▁hello",
                "wo", "wor", "worl", "world", "▁world", "▁w"]:
        vocab.setdefault(tok, len(vocab))
    merges = ["h e", "l l", "he ll", "hell o", "▁ hello",
              "w o", "wo r", "wor l", "worl d", "▁ world", "▁ w"]
    return {
        "model": {
            "type": "BPE", "vocab": vocab, "merges": merges,
            "byte_fallback": True, "unk_token": "<unk>",
        },
        "added_tokens": [
            {"id": 1, "content": "<s>", "special": True},
            {"id": 2, "content": "</s>", "special": True},
        ],
        "normalizer": {
            "type": "Sequence",
            "normalizers": [
                {"type": "Prepend", "prepend": "▁"},
                {"type": "Replace", "pattern": {"String": " "},
                 "content": "▁"},
            ],
        },
        "pre_tokenizer": None,
        "decoder": {
            "type": "Sequence",
            "decoders": [
                {"type": "Replace", "pattern": {"String": "▁"},
                 "content": " "},
                {"type": "ByteFallback"},
                {"type": "Fuse"},
                {"type": "Strip", "content": " ", "start": 1, "stop": 0},
            ],
        },
    }


def test_bytelevel_encode_decode_roundtrip():
    tok = Tokenizer(_bytelevel_spec())
    ids = tok.encode("hello world")
    # 'hello' merges to one token; ' world' -> 'Ġwor' + 'l' + 'd'
    assert tok.id_to_token[ids[0]] == "hello"
    assert tok.decode(ids) == "hello world"
    # arbitrary utf-8 roundtrips through the byte alphabet (no merges)
    s = "héllo ☃"
    assert tok.decode(tok.encode(s)) == s


def test_bytelevel_added_token_bypasses_bpe():
    tok = Tokenizer(_bytelevel_spec())
    ids = tok.encode("hello<|end|>hello")
    end_id = tok.vocab["<|end|>"]
    assert ids.count(end_id) == 1
    assert tok.decode(ids) == "hellohello"  # special skipped
    assert tok.decode(ids, skip_special_tokens=False) == "hello<|end|>hello"


def test_sentencepiece_encode_decode():
    tok = Tokenizer(_sentencepiece_spec())
    ids = tok.encode("hello world")
    toks = [tok.id_to_token[i] for i in ids]
    assert toks == ["▁hello", "▁world"]
    assert tok.decode(ids) == "hello world"
    # byte-fallback for characters missing from the vocab
    ids = tok.encode("héllo")
    assert tok.decode(ids) == "héllo"
    assert any(tok.id_to_token[i].startswith("<0x") for i in ids)


def test_sentencepiece_special_tokens():
    tok = Tokenizer(_sentencepiece_spec())
    ids = tok.encode("<s>hello</s>")
    assert ids[0] == 1 and ids[-1] == 2
    assert tok.decode(ids) == "hello"


def test_from_dir():
    spec = _bytelevel_spec()
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "tokenizer.json"), "w") as f:
            json.dump(spec, f)
        tok = Tokenizer.from_dir(d)
    assert tok.decode(tok.encode("hello")) == "hello"


# ---------------------------------------------------------------------------
# HTTP text path
# ---------------------------------------------------------------------------


def test_http_text_prompt_and_stream():
    """POST a text prompt, get text back; streamed text deltas concatenate
    to the non-streamed text (multi-token utf-8 safe)."""
    from eetq_tpu.models import ModelConfig, quantize_params, random_dense_params
    from eetq_tpu.serve.api import EngineServer
    from eetq_tpu.serve.engine import Engine

    tok = Tokenizer(_bytelevel_spec())
    cfg = ModelConfig(
        vocab_size=tok.vocab_size, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        max_position=128,
    )
    params = quantize_params(
        random_dense_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    )
    eng = Engine(params, cfg, max_batch=2, max_len=64, prompt_buckets=(8,))
    srv = EngineServer(eng, port=0, tokenizer=tok)
    srv.start()
    try:
        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=300)
        body = {"prompt": "hello world", "max_new_tokens": 6}
        conn.request("POST", "/v1/completions", json.dumps(body),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        out = json.loads(r.read())
        assert out["text"] == tok.decode(out["tokens"])
        want_ids = out["tokens"]

        # same prompt as explicit ids gives the same tokens
        conn.request("POST", "/v1/completions",
                     json.dumps({"prompt": tok.encode("hello world"),
                                 "max_new_tokens": 6}),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert json.loads(r.read())["tokens"] == want_ids

        # streamed: text deltas concatenate to the full decode
        conn.request("POST", "/v1/completions",
                     json.dumps({**body, "stream": True}),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        events = [
            json.loads(line[len(b"data: "):])
            for line in r.read().split(b"\n\n")
            if line.startswith(b"data: ")
        ]
        text = "".join(ev["text"] for ev in events)
        assert text == tok.decode(want_ids)
    finally:
        srv.shutdown()


def test_http_text_prompt_without_tokenizer_is_400():
    from eetq_tpu.models import ModelConfig, quantize_params, random_dense_params
    from eetq_tpu.serve.api import EngineServer
    from eetq_tpu.serve.engine import Engine

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, max_position=128,
    )
    params = quantize_params(
        random_dense_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    )
    eng = Engine(params, cfg, max_batch=2, max_len=64, prompt_buckets=(8,))
    srv = EngineServer(eng, port=0)
    srv.start()
    try:
        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=60)
        conn.request("POST", "/v1/completions",
                     json.dumps({"prompt": "hi", "max_new_tokens": 2}),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400
        assert "tokenizer" in json.loads(r.read())["error"]
    finally:
        srv.shutdown()


def test_split_unicode_property_pattern():
    """qwen2/gpt2-family tokenizer.json Split pre-tokenizers use Rust-regex
    Unicode property escapes (\\p{L}, \\p{N}) that Python `re` rejects —
    they must compile (via the `regex` module) and split correctly."""
    spec = _bytelevel_spec()
    # the real qwen2 layout: Sequence [Split(Regex with \p{}), ByteLevel
    # without its own regex]
    spec["pre_tokenizer"] = {
        "type": "Sequence",
        "pretokenizers": [
            {
                "type": "Split",
                "pattern": {
                    "Regex": r" ?\p{L}+| ?\p{N}+|[^\s\p{L}\p{N}]+|\s+"
                },
                "behavior": "Isolated",
                "invert": False,
            },
            {"type": "ByteLevel", "add_prefix_space": False,
             "use_regex": False},
        ],
    }
    tok = Tokenizer(spec)
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"


def test_split_merged_with_previous_semantics():
    """tokenizers-crate MergedWithPrevious: each match fuses with ITS
    preceding segment — a leading or consecutive delimiter forms its own
    piece ('the-final--countdown' -> ['the-', 'final-', '-', 'countdown'],
    '-abc' keeps the leading '-')."""
    import re as _re

    from eetq_tpu.serve.tokenizer import _split

    rx = _re.compile("-")
    assert _split(rx, "the-final--countdown", "MergedWithPrevious", False) \
        == ["the-", "final-", "-", "countdown"]
    assert _split(rx, "-abc", "MergedWithPrevious", False) == ["-", "abc"]
    assert "".join(_split(rx, "-a--b-", "MergedWithPrevious", False)) == "-a--b-"


def test_replace_decoder_regex_pattern():
    """A Replace decoder whose pattern is {'Regex': ...} must substitute
    via the compiled pattern, not literal str.replace of the source."""
    spec = _sentencepiece_spec()
    # replace runs of underscores (regex) with one space in decode output
    spec["decoder"]["decoders"][0] = {
        "type": "Replace", "pattern": {"Regex": "▁+"}, "content": " ",
    }
    tok = Tokenizer(spec)
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"
