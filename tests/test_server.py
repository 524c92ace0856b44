"""HTTP completion server tests: concurrent requests through the
continuous-batching loop (role of the reference's vLLM api_server smoke,
tests/vllm.sh)."""

import json
import threading
import urllib.request

import pytest

from flute_tpu.models import llama
from flute_tpu.serving.continuous import ContinuousBatchingEngine
from flute_tpu.serving.server import serve


@pytest.fixture(scope="module")
def server():
    config = llama.LlamaConfig.tiny()
    params = llama.init_params(config, rng=0)
    qparams = llama.quantize_model(params, num_bits=4, group_size=64)
    eng = ContinuousBatchingEngine(
        params=qparams, config=config, num_slots=2, max_len=32
    )
    srv = serve(eng, port=0)  # ephemeral port
    yield srv
    srv.shutdown()
    srv.loop.shutdown()


def _post(srv, payload):
    port = srv.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/completions",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server):
    port = server.server_address[1]
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"


@pytest.mark.slow
def test_single_completion(server):
    code, out = _post(server, {"prompt": [1, 5, 9], "max_tokens": 4})
    assert code == 200
    assert len(out["tokens"]) == 4


def test_concurrent_requests(server):
    results = {}

    def run(i):
        code, out = _post(
            server, {"prompt": [1 + i, 5, 9], "max_tokens": 3}
        )
        results[i] = (code, out)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 4
    for code, out in results.values():
        assert code == 200 and len(out["tokens"]) == 3


def test_bad_request(server):
    code, out = _post(server, {"prompt": "text not supported w/o tokenizer"})
    assert code == 400 and "error" in out


def test_streaming_completion(server):
    """stream=true returns chunked ndjson: one {"token": t} per generated
    token then a final {"done": true} record matching the full list."""
    port = server.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/completions",
        data=json.dumps({"prompt": [1, 5, 9], "max_tokens": 4,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.status == 200
        records = [json.loads(line) for line in r if line.strip()]
    toks = [rec["token"] for rec in records if "token" in rec]
    final = records[-1]
    assert final.get("done") is True
    assert final["tokens"] == toks
    assert len(toks) == 4

    # streamed greedy output matches the non-streamed one
    code, out = _post(server, {"prompt": [1, 5, 9], "max_tokens": 4})
    assert code == 200 and out["tokens"] == toks


def test_per_request_sampling(server):
    """temperature/top_p ride through per request: sampled output is
    deterministic per seed and differs across seeds (on some prompt)."""
    def sample(seed):
        code, out = _post(server, {
            "prompt": [2, 6, 10, 14], "max_tokens": 8,
            "temperature": 5.0, "top_p": 0.98, "seed": seed,
        })
        assert code == 200
        return out["tokens"]

    a1, a2 = sample(7), sample(7)
    assert a1 == a2  # per-seed determinism
    others = [sample(s) for s in range(5)]
    assert any(o != a1 for o in others)  # temperature actually samples

    # greedy request alongside sampled ones still greedy-deterministic
    code, g1 = _post(server, {"prompt": [1, 5, 9], "max_tokens": 4})
    code, g2 = _post(server, {"prompt": [1, 5, 9], "max_tokens": 4,
                              "temperature": 0.0})
    assert g1["tokens"] == g2["tokens"]


@pytest.mark.slow
def test_gemma2_server():
    """The HTTP server is model-agnostic: a Gemma-2 engine (with the
    quantized tied lm_head) serves completions end-to-end (r2 verdict #8)."""
    from flute_tpu.models import gemma2

    config = gemma2.Gemma2Config.tiny()
    params = gemma2.init_params(config, rng=0)
    qparams = gemma2.quantize_model(
        params, num_bits=4, group_size=64, quantize_lm_head=True
    )
    eng = ContinuousBatchingEngine(
        params=qparams, config=config, num_slots=2, max_len=32,
        forward=gemma2.forward, init_cache=gemma2.init_cache,
    )
    srv = serve(eng, port=0)
    try:
        code, out = _post(srv, {"prompt": [1, 5, 9], "max_tokens": 4})
        assert code == 200 and len(out["tokens"]) == 4
        # greedy determinism through the server
        code2, out2 = _post(srv, {"prompt": [1, 5, 9], "max_tokens": 4})
        assert out2["tokens"] == out["tokens"]
    finally:
        srv.shutdown()
        srv.loop.shutdown()


@pytest.mark.slow
def test_paged_engine_server():
    """The HTTP server runs over PagedEngine (block-pool KV): streaming,
    per-request sampling, and completion all ride the same ServingLoop
    duck-type (token_callback + _finished + submit(sampling=...))."""
    from flute_tpu.serving.paged import PagedEngine

    config = llama.LlamaConfig.tiny()
    params = llama.init_params(config, rng=0)
    qparams = llama.quantize_model(params, num_bits=4, group_size=64)
    dense = ContinuousBatchingEngine(
        params=qparams, config=config, num_slots=2, max_len=32
    )
    srv_d = serve(dense, port=0)
    try:
        _, want = _post(srv_d, {"prompt": [1, 5, 9], "max_tokens": 4})
    finally:
        srv_d.shutdown()
        srv_d.loop.shutdown()

    eng = PagedEngine(
        params=qparams, config=config, num_slots=2,
        block_size=8, num_blocks=10, max_len=32,
    )
    srv = serve(eng, port=0)
    try:
        code, out = _post(srv, {"prompt": [1, 5, 9], "max_tokens": 4})
        assert code == 200 and out["tokens"] == want["tokens"]
        # streaming over the paged engine
        port = srv.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps({"prompt": [1, 5, 9], "max_tokens": 4,
                             "stream": True}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            records = [json.loads(line) for line in r if line.strip()]
        toks = [rec["token"] for rec in records if "token" in rec]
        assert records[-1].get("done") is True
        assert toks == want["tokens"]
    finally:
        srv.shutdown()
        srv.loop.shutdown()


@pytest.mark.slow
def test_paged_speculative_server():
    """The HTTP server runs over PagedSpeculativeEngine: a speculative
    round emits several tokens per step() and the ServingLoop must stream
    each through token_callback in order; output equals the dense oracle
    (draft == target -> pure speed, identical stream)."""
    from flute_tpu.serving.paged_spec import PagedSpeculativeEngine

    config = llama.LlamaConfig.tiny()
    params = llama.init_params(config, rng=0)
    qparams = llama.quantize_model(params, num_bits=4, group_size=64)
    dense = ContinuousBatchingEngine(
        params=qparams, config=config, num_slots=2, max_len=32
    )
    srv_d = serve(dense, port=0)
    try:
        _, want = _post(srv_d, {"prompt": [1, 5, 9], "max_tokens": 6})
    finally:
        srv_d.shutdown()
        srv_d.loop.shutdown()

    eng = PagedSpeculativeEngine(
        params=qparams, config=config,
        draft_params=qparams, draft_config=config,
        k=3, num_slots=2, block_size=8, num_blocks=12, max_len=32,
    )
    srv = serve(eng, port=0)
    try:
        code, out = _post(srv, {"prompt": [1, 5, 9], "max_tokens": 6})
        assert code == 200 and out["tokens"] == want["tokens"]
        assert eng.stats.bonus > 0
    finally:
        srv.shutdown()
        srv.loop.shutdown()


def test_openai_schema(server):
    """A request carrying "model" (as every OpenAI SDK does) gets the
    OpenAI completions schema — non-streamed object shape + usage, SSE
    streaming with [DONE], and GET /v1/models — while the same prompt
    without "model" keeps the lightweight schema and yields the same
    token ids."""
    _, legacy = _post(server, {"prompt": [1, 5, 9], "max_tokens": 4})

    code, out = _post(server, {"prompt": [1, 5, 9], "max_tokens": 4,
                               "model": "tiny", "logprobs": True})
    assert code == 200
    assert out["object"] == "text_completion"
    lps = out["choices"][0]["logprobs"]["token_logprobs"]
    assert len(lps) == 4 and all(v <= 0.0 for v in lps)
    assert out["model"] == "tiny"
    choice = out["choices"][0]
    assert choice["token_ids"] == legacy["tokens"]
    assert choice["finish_reason"] == "length"
    assert out["usage"] == {"prompt_tokens": 3, "completion_tokens": 4,
                            "total_tokens": 7}

    port = server.server_address[1]
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/v1/models", timeout=30
    ) as r:
        models = json.loads(r.read())
    assert models["object"] == "list" and models["data"][0]["object"] == "model"

    # SSE stream: data: {chunk} records then data: [DONE]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/completions",
        data=json.dumps({"prompt": [1, 5, 9], "max_tokens": 4,
                         "model": "tiny", "stream": True}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        lines = [ln.decode().strip() for ln in r if ln.strip()]
    assert all(ln.startswith("data: ") for ln in lines)
    assert lines[-1] == "data: [DONE]"
    chunks = [json.loads(ln[6:]) for ln in lines[:-1]]
    toks = [c["choices"][0]["token_ids"][0] for c in chunks
            if c["choices"][0]["token_ids"]]
    assert toks == legacy["tokens"]
    assert chunks[-1]["choices"][0]["finish_reason"] == "length"


@pytest.mark.slow
def test_chat_completions():
    """/v1/chat/completions renders messages through the tokenizer's chat
    template and answers in the OpenAI chat schema (object + SSE chunk
    stream); output ids equal a plain completion on the templated
    prompt."""

    class StubTok:
        # duck-typed tokenizer: template = flatten ids with a 7 separator
        eos_token_id = None

        def apply_chat_template(self, messages, add_generation_prompt=True):
            ids = []
            for m in messages:
                ids.extend(int(t) for t in m["content"].split())
                ids.append(7)
            return ids

        def __call__(self, text):
            return {"input_ids": [int(t) for t in text.split()]}

        def decode(self, toks):
            # leading space per token so per-token streamed decodes
            # concatenate into the same string as a whole-list decode
            return "".join(f" {t}" for t in toks)

    config = llama.LlamaConfig.tiny()
    params = llama.init_params(config, rng=0)
    qparams = llama.quantize_model(params, num_bits=4, group_size=64)
    eng = ContinuousBatchingEngine(
        params=qparams, config=config, num_slots=2, max_len=32
    )
    srv = serve(eng, port=0, tokenizer=StubTok(), model_id="tiny-chat")
    try:
        msgs = [{"role": "user", "content": "1 5 9"}]
        _, want = _post(srv, {"prompt": [1, 5, 9, 7], "max_tokens": 4})

        port = srv.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=json.dumps({"messages": msgs, "max_tokens": 4}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert out["object"] == "chat.completion"
        assert out["model"] == "tiny-chat"
        msg = out["choices"][0]["message"]
        assert msg["role"] == "assistant"
        assert msg["content"].split() == [str(t) for t in want["tokens"]]
        assert out["choices"][0]["finish_reason"] == "length"
        assert out["usage"]["prompt_tokens"] == 4

        # streamed chat: role delta, content deltas, finish, [DONE]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=json.dumps({"messages": msgs, "max_tokens": 4,
                             "stream": True}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            lines = [ln.decode().strip() for ln in r if ln.strip()]
        assert lines[-1] == "data: [DONE]"
        chunks = [json.loads(ln[6:]) for ln in lines[:-1]]
        assert chunks[0]["choices"][0]["delta"] == {"role": "assistant"}
        content = "".join(
            c["choices"][0]["delta"].get("content", "") for c in chunks
        )
        assert content.split() == [str(t) for t in want["tokens"]]
        assert chunks[-1]["choices"][0]["finish_reason"] == "length"
    finally:
        srv.shutdown()
        srv.loop.shutdown()


def test_metrics_endpoint(server):
    """/metrics exposes Prometheus-format serving counters that advance
    with completed requests."""
    _post(server, {"prompt": [2, 4, 6], "max_tokens": 3})
    port = server.server_address[1]
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/metrics", timeout=30
    ) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    vals = {}
    for ln in text.splitlines():
        if ln and not ln.startswith("#"):
            k, v = ln.split()
            vals[k] = float(v)
    assert vals["flute_requests_total"] >= 1
    assert vals["flute_completed_total"] >= 1
    assert vals["flute_tokens_generated_total"] >= 3
    assert vals["flute_uptime_seconds"] > 0


def test_n_completions(server):
    """OpenAI "n": multiple choices per request — per-choice seeds make
    sampled choices differ (on some prompt) while each stays
    deterministic; usage counts all choices."""
    code, out = _post(server, {
        "prompt": [2, 6, 10, 14], "max_tokens": 6, "model": "tiny",
        "n": 3, "temperature": 5.0, "top_p": 0.98, "seed": 11,
    })
    assert code == 200 and len(out["choices"]) == 3
    ids = [c["token_ids"] for c in out["choices"]]
    assert [c["index"] for c in out["choices"]] == [0, 1, 2]
    assert len(set(map(tuple, ids))) > 1  # seeds differ -> choices differ
    assert out["usage"]["completion_tokens"] == sum(len(t) for t in ids)

    # choice 0 must equal a single-request run with the same seed
    code, one = _post(server, {
        "prompt": [2, 6, 10, 14], "max_tokens": 6, "model": "tiny",
        "temperature": 5.0, "top_p": 0.98, "seed": 11,
    })
    assert one["choices"][0]["token_ids"] == ids[0]

    code, err = _post(server, {"prompt": [1, 2], "max_tokens": 2, "n": 2})
    assert code == 400  # n > 1 needs the OpenAI schema
