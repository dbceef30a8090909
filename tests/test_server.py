"""HTTP serving frontend: online request admission through Engine.run's
feeder hook, per-request params over the wire, concurrent handlers."""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitdistiller_tpu.models import TINY_TEST, forward, init_params
from bitdistiller_tpu.serve import Engine, SamplingParams
from bitdistiller_tpu.serve.server import ServingFrontend

# Integration tier: this whole module is `-m slow` (many multi-second
# XLA CPU compiles). The default `-m 'not slow'` tier keeps the unit /
# parity / kernel tests for a minutes-scale pre-commit run; run the
# full suite (no -m filter) before shipping engine/trainer changes.
pytestmark = pytest.mark.slow



class CharTok:
    def encode(self, s):
        return [(ord(c) % 250) + 3 for c in s]

    def decode(self, ids, **kw):
        return "".join(chr((i - 3) % 26 + 97) for i in ids)


@pytest.fixture()
def frontend():
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0))
    eng = Engine(
        params, cfg, max_slots=2, max_len=64,
        sampling=SamplingParams(temperature=1.0), eos_token_id=None,
    )
    front = ServingFrontend(eng, CharTok(), port=0)
    t = threading.Thread(target=front.serve_forever)
    t.start()
    host, port = front.address
    yield front, f"http://{host}:{port}", params, cfg
    front.shutdown()
    t.join(timeout=60)
    assert not t.is_alive()


def _post(url, body):
    req = urllib.request.Request(
        f"{url}/generate", json.dumps(body).encode(),
        {"Content-Type": "application/json"},
    )
    return json.load(urllib.request.urlopen(req, timeout=120))


def test_http_health_and_greedy(frontend):
    front, url, params, cfg = frontend
    h = json.load(urllib.request.urlopen(f"{url}/health", timeout=30))
    assert h["ok"] and h["active_slots"] == 0

    out = _post(url, {"prompt": "hello", "max_new_tokens": 5,
                      "temperature": 0.0})
    assert out["finish_reason"] == "length" and len(out["tokens"]) == 5
    # greedy-over-HTTP must equal the manual full-context loop
    seq = CharTok().encode("hello")
    want = []
    for _ in range(5):
        logits, _ = forward(params, cfg, jnp.asarray([seq], jnp.int32))
        nxt = int(logits[0, -1].argmax())
        want.append(nxt)
        seq.append(nxt)
    assert out["tokens"] == want


def test_http_concurrent_mixed_params(frontend):
    front, url, *_ = frontend
    results = {}

    def hit(name, body):
        results[name] = _post(url, body)

    threads = [
        threading.Thread(target=hit, args=("a", {
            "prompt": "abc", "max_new_tokens": 8, "temperature": 0.0})),
        threading.Thread(target=hit, args=("b", {
            "prompt": "defgh", "max_new_tokens": 8})),
        threading.Thread(target=hit, args=("c", {
            "prompt_tokens": [5, 9, 4], "max_new_tokens": 8,
            "temperature": 1.3, "top_k": 4})),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert set(results) == {"a", "b", "c"}
    for r in results.values():
        assert len(r["tokens"]) == 8 and r["decode_tokens"] > 0

    # bad request -> 400
    req = urllib.request.Request(
        f"{url}/generate", b"{}", {"Content-Type": "application/json"}
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_http_stop_tokens(frontend):
    front, url, params, cfg = frontend
    base = _post(url, {"prompt": "xyz", "max_new_tokens": 6,
                       "temperature": 0.0})
    stop = base["tokens"][1]
    out = _post(url, {"prompt": "xyz", "max_new_tokens": 6,
                      "temperature": 0.0, "stop_token_ids": [stop]})
    assert out["tokens"] == base["tokens"][:2]
    assert out["finish_reason"] == "stop"


def test_http_sse_streaming(frontend):
    front, url, params, cfg = frontend
    base = _post(url, {"prompt": "stream", "max_new_tokens": 5,
                       "temperature": 0.0})
    req = urllib.request.Request(
        f"{url}/generate",
        json.dumps({"prompt": "stream", "max_new_tokens": 5,
                    "temperature": 0.0, "stream": True}).encode(),
        {"Content-Type": "application/json"},
    )
    resp = urllib.request.urlopen(req, timeout=120)
    assert resp.headers["Content-Type"] == "text/event-stream"
    toks, done = [], None
    for line in resp:
        line = line.decode().strip()
        if not line.startswith("data: "):
            continue
        evt = json.loads(line[6:])
        if evt.get("done"):
            done = evt
            break
        toks.append(evt["token"])
    assert toks == base["tokens"]
    assert done["finish_reason"] == "length"
    assert done["text"] == base["text"]


def test_loadtest_script_against_frontend(frontend):
    """scripts/loadtest.py run_load drives concurrent JSON and SSE traffic
    and produces a coherent summary (every request served, tokens counted)."""
    import importlib.util
    import os

    front, url, params, cfg = frontend
    spec = importlib.util.spec_from_file_location(
        "loadtest",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "loadtest.py"),
    )
    lt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(lt)

    bodies = [
        {"prompt_tokens": [3 + (i % 7), 5, 9], "max_new_tokens": 4,
         "temperature": 0.0}
        for i in range(6)
    ]
    summary = lt.run_load(f"{url}/generate", bodies, concurrency=3)
    assert summary["errors"] == 0 and summary["ok"] == 6
    assert summary["throughput_tok_s"] > 0
    assert summary["latency_p50_s"] <= summary["latency_p99_s"]
    assert summary["prefill_p50_s"] >= 0

    sse = lt.run_load(f"{url}/generate", bodies[:3], concurrency=2, stream=True)
    assert sse["errors"] == 0 and sse["ok"] == 3
    assert sse["ttft_p50_s"] > 0


def test_http_cache_prompt_flag():
    """cache_prompt over the wire: second identical request is a prompt-cache
    hit (health counters) with identical greedy text."""
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0))
    eng = Engine(
        params, cfg, max_slots=2, max_len=64,
        sampling=SamplingParams(temperature=1.0), eos_token_id=None,
        prompt_cache_size=2,
    )
    front = ServingFrontend(eng, CharTok(), port=0)
    t = threading.Thread(target=front.serve_forever)
    t.start()
    host, port = front.address
    url = f"http://{host}:{port}"
    try:
        body = {"prompt": "sys", "max_new_tokens": 4, "temperature": 0.0,
                "cache_prompt": True}
        a = _post(url, body)
        b = _post(url, dict(body, cache_prompt=False))
        assert a["text"] == b["text"]
        h = json.load(urllib.request.urlopen(f"{url}/health", timeout=30))
        assert h["prompt_cache_hits"] == 1 and h["prompt_cache_misses"] == 1
    finally:
        front.shutdown()
        t.join(timeout=60)


def test_openai_compatible_endpoints(frontend):
    """/v1/completions and /v1/chat/completions: OpenAI response shapes,
    usage accounting, SSE chunk stream with [DONE] terminator, /metrics."""
    front, url, params, cfg = frontend

    out = _post_path(url, "/v1/completions", {
        "prompt": "hello", "max_tokens": 5, "temperature": 0.0})
    assert out["object"] == "text_completion"
    assert out["choices"][0]["finish_reason"] == "length"
    assert out["usage"]["completion_tokens"] == 5
    assert out["usage"]["total_tokens"] == out["usage"]["prompt_tokens"] + 5
    # parity with the native endpoint at greedy
    native = _post(url, {"prompt": "hello", "max_new_tokens": 5,
                         "temperature": 0.0})
    assert out["choices"][0]["text"] == native["text"]

    chat = _post_path(url, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hello"}],
        "max_tokens": 4, "temperature": 0.0})
    assert chat["object"] == "chat.completion"
    assert chat["choices"][0]["message"]["role"] == "assistant"
    assert len(chat["choices"][0]["message"]["content"]) > 0

    # OpenAI SSE stream: chunks then [DONE]
    req = urllib.request.Request(
        f"{url}/v1/chat/completions",
        json.dumps({"messages": [{"role": "user", "content": "hi"}],
                    "max_tokens": 3, "temperature": 0.0,
                    "stream": True}).encode(),
        {"Content-Type": "application/json"},
    )
    lines = [l for l in urllib.request.urlopen(req, timeout=120)
             if l.startswith(b"data: ")]
    assert lines[-1].strip() == b"data: [DONE]"
    chunks = [json.loads(l[6:]) for l in lines[:-1]]
    assert all(c["object"] == "chat.completion.chunk" for c in chunks)
    text = "".join(c["choices"][0]["delta"]["content"] for c in chunks)
    assert len(chunks) == 3 and len(text) > 0

    metrics = urllib.request.urlopen(f"{url}/metrics", timeout=30).read()
    assert b"bdt_active_slots" in metrics and b"bdt_spec_tokens" in metrics


def _post_path(url, path, body):
    req = urllib.request.Request(
        f"{url}{path}", json.dumps(body).encode(),
        {"Content-Type": "application/json"},
    )
    return json.load(urllib.request.urlopen(req, timeout=120))


def test_render_chat_multiturn_forms():
    """Multi-turn message lists render each family's dialogue format in
    order — assistant history carries its role markers (never folded into
    the user block)."""
    from bitdistiller_tpu.utils.prompts import render_chat

    msgs = [
        {"role": "system", "content": "be brief"},
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello!"},
        {"role": "user", "content": "how are you?"},
    ]
    chatml = render_chat("chatml", msgs)
    assert chatml == (
        "<|im_start|>system\nbe brief<|im_end|>\n"
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>assistant\nhello!<|im_end|>\n"
        "<|im_start|>user\nhow are you?<|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    llama2 = render_chat("llama2", msgs)
    assert llama2 == (
        "[INST] <<SYS>>\nbe brief\n<</SYS>>\n\nhi [/INST] hello! </s>"
        "<s>[INST] how are you? [/INST]"
    )
    vic = render_chat("vicuna", msgs)
    assert vic == (
        "be brief USER: hi ASSISTANT: hello!</s> USER: how are you? ASSISTANT:"
    )
    fal = render_chat("falcon", msgs)
    assert fal == "be brief\nUser: hi\nAssistant: hello!\nUser: how are you?\nAssistant:"
    raw = render_chat("raw", msgs)
    assert "assistant: hello!" in raw and raw.endswith("assistant:")
    # single user turn keeps the plain single-turn form
    single = [{"role": "user", "content": "hi"}]
    assert render_chat("llama2", single) == "[INST] hi [/INST]"
    assert render_chat("raw", single) == "hi"


def test_openai_chat_multiturn_endpoint(frontend):
    """The chat endpoint renders the FULL message list through the template
    layer: the engine-side prompt equals render_chat's output, and assistant
    history is present with role markers."""
    front, url, *_ = frontend
    front.template = "chatml"
    seen = []
    orig_encode = front.tok.encode
    front.tok = type(front.tok)()
    front.tok.encode = lambda s: (seen.append(s), orig_encode(s))[1]
    try:
        msgs = [
            {"role": "system", "content": "sys"},
            {"role": "user", "content": "q1"},
            {"role": "assistant", "content": "a1"},
            {"role": "user", "content": "q2"},
        ]
        out = _post_path(url, "/v1/chat/completions",
                         {"messages": msgs, "max_tokens": 2,
                          "temperature": 0.0})
        assert out["choices"][0]["message"]["content"]
        from bitdistiller_tpu.utils.prompts import render_chat

        assert seen and seen[0] == render_chat("chatml", msgs)
        assert "<|im_start|>assistant\na1<|im_end|>" in seen[0]
    finally:
        front.template = "raw"


def test_openai_multi_token_stop_string(frontend):
    """Stop strings longer than one token match host-side at emit: the
    generation ends with reason 'stop' and the returned text excludes the
    stop string (OpenAI semantics)."""
    front, url, *_ = frontend
    base = _post_path(url, "/v1/completions", {
        "prompt": "hello", "max_tokens": 12, "temperature": 0.0})
    full = base["choices"][0]["text"]
    assert len(full) == 12
    stop = full[5:7]  # 2 chars = 2 tokens under CharTok
    out = _post_path(url, "/v1/completions", {
        "prompt": "hello", "max_tokens": 12, "temperature": 0.0,
        "stop": stop})
    assert out["choices"][0]["finish_reason"] == "stop"
    got = out["choices"][0]["text"]
    assert got == full[: full.find(stop)]
    assert stop not in got


def test_sse_timeout_sends_terminator():
    """An SSE stream whose engine never produces tokens must still end with
    a terminator (the old code raised queue.Empty and hung the client)."""
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0))
    eng = Engine(params, cfg, max_slots=2, max_len=64, eos_token_id=None)
    front = ServingFrontend(eng, CharTok(), port=0)
    front.timeout_s = 0.3
    # HTTP only — the engine loop is never started, so no tokens ever come
    t = threading.Thread(target=front.httpd.serve_forever, daemon=True)
    t.start()
    try:
        host, port = front.address
        req = urllib.request.Request(
            f"http://{host}:{port}/v1/completions",
            json.dumps({"prompt": "hi", "max_tokens": 3,
                        "stream": True}).encode(),
            {"Content-Type": "application/json"},
        )
        lines = [l for l in urllib.request.urlopen(req, timeout=30) if l.strip()]
        assert lines[-2].strip() == b'data: {"error": "timeout"}'
        assert lines[-1].strip() == b"data: [DONE]"
    finally:
        front.httpd.shutdown()
        t.join(timeout=30)
