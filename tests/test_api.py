"""HTTP serving front-end: the dependency-free EngineServer must stream
per-token SSE events and serve non-streamed completions that exactly match
the engine's own greedy output (the TGI-host role the reference delegates
to, /root/reference/README.md:88-101)."""

import http.client
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.models import ModelConfig, quantize_params, random_dense_params
from eetq_tpu.serve.api import EngineServer
from eetq_tpu.serve.engine import Engine
from eetq_tpu.serve.generate import greedy_generate

CFG = ModelConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    max_position=128,
)


@pytest.fixture(scope="module")
def params():
    return quantize_params(
        random_dense_params(CFG, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    )


def _ref_greedy(params, prompt, n):
    out = greedy_generate(
        params, CFG, jnp.asarray(np.asarray(prompt, np.int32)[None]), n
    )
    return [int(t) for t in np.asarray(out[0])]


def _post(conn, path, body):
    conn.request(
        "POST", path, json.dumps(body), {"Content-Type": "application/json"}
    )
    return conn.getresponse()


def test_engine_on_token_and_poll(params):
    """Streaming hooks at the Engine level: the per-token callback and the
    incremental poll() cursor both reproduce result() exactly."""
    eng = Engine(params, CFG, max_batch=2, max_len=64, prompt_buckets=(8,))
    got = []
    uid = eng.add_request(
        [3, 17, 42], 6, on_token=lambda u, t: got.append((u, t))
    )
    uid2 = eng.add_request([5, 6, 7, 8], 4)
    polled = []
    done = False
    while eng.has_work:
        eng.step()
        new, done = eng.poll(uid2)
        polled.extend(new)
    assert [t for _, t in got] == eng.result(uid)
    assert all(u == uid for u, _ in got)
    assert done and polled == eng.result(uid2)
    # poll after completion returns nothing new but stays done
    new, done = eng.poll(uid2)
    assert new == [] and done


def test_http_completions_stream_and_health(params):
    eng = Engine(params, CFG, max_batch=2, max_len=64, prompt_buckets=(8,))
    prompt = [3, 17, 42, 9]
    ref = _ref_greedy(params, prompt, 8)
    srv = EngineServer(eng, port=0)  # OS-assigned port
    srv.start()
    try:
        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=300)

        # non-streamed completion
        r = _post(conn, "/v1/completions",
                  {"prompt": prompt, "max_new_tokens": 8})
        assert r.status == 200
        assert json.loads(r.read())["tokens"] == ref

        # streamed completion: SSE events concatenate to the same tokens
        r = _post(conn, "/v1/completions",
                  {"prompt": prompt, "max_new_tokens": 8, "stream": True})
        assert r.status == 200
        assert r.getheader("Content-Type") == "text/event-stream"
        events = [
            json.loads(line[len(b"data: "):])
            for line in r.read().split(b"\n\n")
            if line.startswith(b"data: ")
        ]
        toks = [t for ev in events for t in ev["tokens"]]
        assert toks == ref
        assert events[-1]["done"] and not any(
            ev["done"] for ev in events[:-1]
        )

        # health
        conn.request("GET", "/health")
        r = conn.getresponse()
        health = json.loads(r.read())
        assert r.status == 200 and health["ok"]

        # validation errors surface as 400s, not hangs
        r = _post(conn, "/v1/completions",
                  {"prompt": prompt, "max_new_tokens": 10_000})
        assert r.status == 400
        assert "exceeds" in json.loads(r.read())["error"]
        r = _post(conn, "/v1/completions", {"max_new_tokens": 4})
        assert r.status == 400
    finally:
        srv.shutdown()


def test_http_concurrent_requests_batch(params):
    """Multiple in-flight HTTP requests share the continuous batch and each
    gets its own exact greedy output."""
    import threading

    eng = Engine(params, CFG, max_batch=2, max_len=64, prompt_buckets=(8,))
    srv = EngineServer(eng, port=0)
    srv.start()
    prompts = [[3, 17, 42], [5, 6, 7, 8], [1, 2], [99, 42, 7]]
    budgets = [6, 4, 7, 5]
    results: dict[int, list[int]] = {}

    def worker(i):
        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=300)
        r = _post(conn, "/v1/completions",
                  {"prompt": prompts[i], "max_new_tokens": budgets[i],
                   "stream": i % 2 == 0})
        body = r.read()
        if i % 2 == 0:
            toks = [
                t
                for line in body.split(b"\n\n")
                if line.startswith(b"data: ")
                for t in json.loads(line[len(b"data: "):])["tokens"]
            ]
        else:
            toks = json.loads(body)["tokens"]
        results[i] = toks

    try:
        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        for i in range(4):
            assert results[i] == _ref_greedy(params, prompts[i], budgets[i])
    finally:
        srv.shutdown()


def test_stream_delta_utf8_split():
    """A poll window ending mid-UTF-8-sequence must not stream the U+FFFD
    placeholder (it would misalign every later delta); trailing incomplete
    chars are held back until they complete or the stream ends."""
    from eetq_tpu.serve.api import _stream_delta

    emoji = "\N{THUMBS UP SIGN}"  # 4 UTF-8 bytes
    raw = f"ok {emoji}!".encode()
    # window 1 cuts the emoji after 2 of its 4 bytes
    t1 = raw[:5].decode("utf-8", errors="replace")
    assert t1.endswith("�")
    d1, r1, prev = _stream_delta("", t1, done=False)
    assert d1 == "ok " and r1 is None
    # window 2 completes the char
    t2 = raw.decode("utf-8")
    d2, r2, prev = _stream_delta(prev, t2, done=False)
    assert d2 == f"{emoji}!" and r2 is None
    assert d1 + d2 == f"ok {emoji}!"
    # a trailing incomplete char at stream end IS emitted (nothing can
    # complete it)
    d3, r3, prev2 = _stream_delta("", t1, done=True)
    assert d3 == t1 and r3 is None
    # defensive resync when the decoded text diverges from what was sent
    d4, r4, _ = _stream_delta("ok X", "ok Y more", done=False)
    assert r4 == 3 and d4 == "Y more"
