"""API server tests (reference has none — SURVEY.md §4 gaps).

Spins the real aiohttp server on an ephemeral port and exercises the
reference-compatible flow: POST /generate -> poll GET /result, plus the /v1
endpoint, 404 semantics, abort, and metrics.
"""

import asyncio
import json
import threading
import time

import httpx
import pytest
from aiohttp import web

from vllmini_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from vllmini_tpu.engine.engine import LLMEngine
from vllmini_tpu.engine.scheduler import Scheduler
from vllmini_tpu.server.api import create_app

TINY = ModelConfig(family="gpt2", vocab_size=128, hidden_size=32,
                   num_layers=2, num_heads=2, max_position_embeddings=64,
                   dtype="float32")


class WordTokenizer:
    """Deterministic toy tokenizer: whitespace-split ints."""

    eos_token_id = 127

    def encode(self, s):
        # Non-numeric words (e.g. chat-template role tags) map to a stable
        # byte-sum id so any text tokenizes.
        return [int(t) % 128 if t.lstrip("-").isdigit()
                else sum(t.encode()) % 128 for t in s.split()]

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


class ServerThread:
    def __init__(self, app: web.Application):
        self.app = app
        self.port = None
        self._ready = threading.Event()
        self._loop = None
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        self._loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self._loop)
        runner = web.AppRunner(self.app)
        self._loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", 0)
        self._loop.run_until_complete(site.start())
        self.port = site._server.sockets[0].getsockname()[1]
        self._runner = runner
        self._ready.set()
        self._loop.run_forever()
        self._loop.run_until_complete(runner.cleanup())

    def start(self):
        self._thread.start()
        assert self._ready.wait(timeout=30)
        return f"http://127.0.0.1:{self.port}"

    def stop(self):
        if self._loop is not None:
            self._loop.call_soon_threadsafe(self._loop.stop)
        self._thread.join(timeout=30)


@pytest.fixture()
def client():
    cfg = EngineConfig(
        model=TINY,
        cache=CacheConfig(num_pages=32, page_size=4, max_pages_per_seq=8,
                          kv_dtype="float32"),
        scheduler=SchedulerConfig(max_decode_slots=2,
                                  prefill_buckets=(8, 16)),
        hf_model=None,
    )
    scheduler = Scheduler(LLMEngine(cfg))
    server = ServerThread(create_app(scheduler, WordTokenizer()))
    url = server.start()
    with httpx.Client(base_url=url, timeout=30.0) as c:
        yield c
    server.stop()


def poll_result(client, sid, timeout=180.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        r = client.get(f"/result/{sid}")
        assert r.status_code == 200
        body = r.json()
        if body["status"] == "completed":
            return body
        time.sleep(0.2)
    raise TimeoutError("generation did not complete")


def test_generate_and_result(client):
    r = client.post("/generate", json={"prompt": "1 2 3", "max_length": 4})
    assert r.status_code == 200
    sid = r.json()["sequence_id"]
    body = poll_result(client, sid)
    assert body["status"] == "completed"
    assert body["num_generated"] == 4
    toks = body["generated"].split()
    assert len(toks) == 4
    # Result is NOT deleted by reading it (unlike the reference).
    again = client.get(f"/result/{sid}")
    assert again.status_code == 200
    assert again.json() == body


def test_max_length_honored_per_request(client):
    r1 = client.post("/generate", json={"prompt": "5 6", "max_length": 2})
    r2 = client.post("/generate", json={"prompt": "5 6", "max_length": 7})
    b1 = poll_result(client, r1.json()["sequence_id"])
    b2 = poll_result(client, r2.json()["sequence_id"])
    assert b1["num_generated"] == 2
    assert b2["num_generated"] == 7


def test_unknown_sequence_404(client):
    assert client.get("/result/999999").status_code == 404


def test_v1_generate_greedy_deterministic(client):
    req = {"prompt": "9 8 7", "max_new_tokens": 3, "greedy": True}
    a = client.post("/v1/generate", json=req).json()["sequence_id"]
    b = client.post("/v1/generate", json=req).json()["sequence_id"]
    ra, rb = poll_result(client, a), poll_result(client, b)
    assert ra["generated"] == rb["generated"]


def test_delete_and_abort(client):
    r = client.post("/generate", json={"prompt": "1 2", "max_length": 200})
    sid = r.json()["sequence_id"]
    assert client.delete(f"/result/{sid}").json() == {"ok": True}
    assert client.get(f"/result/{sid}").status_code == 404


def test_malformed_requests_400(client):
    assert client.post("/generate", json={"prompt": "",
                                          "max_length": 2}).status_code == 400
    assert client.post("/generate", json={"max_length": 2}).status_code == 400
    assert client.post("/generate",
                       json={"prompt": "1", "max_length": 0}).status_code == 400
    assert client.get("/result/notanint").status_code == 400


def test_metrics_and_health(client):
    assert client.get("/healthz").json() == {"status": "ok"}
    r = client.post("/generate", json={"prompt": "1 2 3", "max_length": 2})
    poll_result(client, r.json()["sequence_id"])
    m = client.get("/metrics").json()
    assert m.get("finished_requests", 0) >= 1
    assert "free_pages" in m


def test_openai_completions_endpoint(client):
    """OpenAI-compatible /v1/completions: blocking envelope, n>1 via COW
    forks, temperature=0 greedy, usage accounting."""
    r = client.post("/v1/completions", json={
        "prompt": "1 2 3 4 5", "max_tokens": 4, "temperature": 0})
    assert r.status_code == 200
    body = r.json()
    assert body["object"] == "text_completion"
    assert len(body["choices"]) == 1
    c = body["choices"][0]
    assert c["finish_reason"] in ("length", "stop")
    assert len(c["text"].split()) <= 4
    assert body["usage"]["prompt_tokens"] == 5
    assert body["usage"]["completion_tokens"] == len(c["text"].split())

    # n=2 with a fixed seed: two choices, deterministic across calls.
    r1 = client.post("/v1/completions", json={
        "prompt": "7 8 9", "max_tokens": 3, "temperature": 0.8,
        "seed": 11, "n": 2})
    r2 = client.post("/v1/completions", json={
        "prompt": "7 8 9", "max_tokens": 3, "temperature": 0.8,
        "seed": 11, "n": 2})
    assert r1.status_code == 200 and r2.status_code == 200
    t1 = [c["text"] for c in r1.json()["choices"]]
    t2 = [c["text"] for c in r2.json()["choices"]]
    assert len(t1) == 2 and t1 == t2


def test_openai_chat_completions(client):
    """`/v1/chat/completions`: blocking greedy determinism, logprobs in the
    chat format, and SSE streaming concat == blocking content."""
    body = {"messages": [{"role": "system", "content": "0"},
                         {"role": "user", "content": "1 2 3 4 5"}],
            "max_tokens": 5, "temperature": 0}
    r1 = client.post("/v1/chat/completions", json=body)
    assert r1.status_code == 200
    c1 = r1.json()["choices"][0]
    assert c1["message"]["role"] == "assistant"
    assert len(c1["message"]["content"].split()) >= 1
    assert r1.json()["usage"]["completion_tokens"] >= 1
    r2 = client.post("/v1/chat/completions", json=body)
    assert r2.json()["choices"][0]["message"]["content"] \
        == c1["message"]["content"]

    # logprobs: chat format (per-token content entries).
    r = client.post("/v1/chat/completions", json={**body, "logprobs": True})
    lp = r.json()["choices"][0]["logprobs"]["content"]
    assert lp and all(e["logprob"] <= 0 for e in lp)
    assert [e["token"] for e in lp] and lp[0]["top_logprobs"]

    # streaming: deltas concat to the blocking content.
    with client.stream("POST", "/v1/chat/completions",
                       json={**body, "stream": True}) as r:
        text, finish = "", None
        for line in r.iter_lines():
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            ch = json.loads(line[len("data: "):])["choices"][0]
            text += ch["delta"].get("content", "")
            finish = ch["finish_reason"] or finish
    assert text == c1["message"]["content"], (text, c1)
    assert finish in ("stop", "length")


def test_openai_completions_logprobs(client):
    """`logprobs` returns per-token strings, device-captured log-probs, and
    text offsets; greedy sampled-token logprob must be the max, i.e. <= 0
    and consistent across identical runs."""
    r = client.post("/v1/completions", json={
        "prompt": "1 2 3 4 5", "max_tokens": 4, "temperature": 0,
        "logprobs": 1})
    c = r.json()["choices"][0]
    lp = c["logprobs"]
    assert lp is not None
    n = len(lp["tokens"])
    assert n >= 1
    assert len(lp["token_logprobs"]) == n == len(lp["text_offset"])
    assert all(x <= 0.0 for x in lp["token_logprobs"])
    assert "".join(lp["tokens"]) in c["text"] or n == len(
        lp["token_logprobs"])
    assert lp["top_logprobs"] and list(lp["top_logprobs"][0].values())[0] \
        == lp["token_logprobs"][0]
    # Deterministic across runs (greedy).
    r2 = client.post("/v1/completions", json={
        "prompt": "1 2 3 4 5", "max_tokens": 4, "temperature": 0,
        "logprobs": 1})
    assert r2.json()["choices"][0]["logprobs"]["token_logprobs"] \
        == lp["token_logprobs"]


def test_openai_completions_stop_echo_multiprompt(client):
    """OpenAI surface upgrades (VERDICT r2 weak #9): stop strings truncate
    (and early-abort), echo prepends the prompt, a prompt LIST yields
    prompt-major choices."""
    # Reference run: what does greedy produce for this prompt?
    base = client.post("/v1/completions", json={
        "prompt": "1 2 3 4 5", "max_tokens": 6, "temperature": 0})
    text = base.json()["choices"][0]["text"]
    toks = text.split()
    assert len(toks) >= 2
    # Stop on the second generated "word": the text must be truncated
    # BEFORE it (stop excluded), finish_reason "stop".
    r = client.post("/v1/completions", json={
        "prompt": "1 2 3 4 5", "max_tokens": 6, "temperature": 0,
        "stop": [" " + toks[1]]})
    c = r.json()["choices"][0]
    assert c["text"] == toks[0], (c, text)
    assert c["finish_reason"] == "stop"

    # echo: prompt + completion decoded TOGETHER (r5: independent decodes
    # lose the boundary separator / BPE merges across it — the toy
    # tokenizer's space-joined decode makes that visible).
    r = client.post("/v1/completions", json={
        "prompt": "1 2 3 4 5", "max_tokens": 6, "temperature": 0,
        "echo": True})
    c = r.json()["choices"][0]
    assert c["text"] == "1 2 3 4 5 " + text

    # Multi-prompt list: one choice per prompt, prompt-major order, each
    # equal to its standalone greedy run.
    other = client.post("/v1/completions", json={
        "prompt": "9 8 7", "max_tokens": 6, "temperature": 0})
    r = client.post("/v1/completions", json={
        "prompt": ["1 2 3 4 5", "9 8 7"], "max_tokens": 6,
        "temperature": 0})
    body = r.json()
    assert [c["index"] for c in body["choices"]] == [0, 1]
    assert body["choices"][0]["text"] == text
    assert body["choices"][1]["text"] == other.json()["choices"][0]["text"]
    assert body["usage"]["prompt_tokens"] == 8


def test_openai_completions_stream_stop_string(client):
    """Streaming with a stop string: streamed concat equals the blocking
    stop-truncated text and the final chunk reports finish_reason stop."""
    base = client.post("/v1/completions", json={
        "prompt": "3 1 4 1 5", "max_tokens": 6, "temperature": 0})
    toks = base.json()["choices"][0]["text"].split()
    assert len(toks) >= 3
    stop = " " + toks[2]
    blocking = client.post("/v1/completions", json={
        "prompt": "3 1 4 1 5", "max_tokens": 6, "temperature": 0,
        "stop": stop})
    import json as _json
    with client.stream("POST", "/v1/completions", json={
            "prompt": "3 1 4 1 5", "max_tokens": 6, "temperature": 0,
            "stop": stop, "stream": True}) as r:
        chunks, finish = [], None
        for line in r.iter_lines():
            if not line.startswith("data: ") or line.endswith("[DONE]"):
                continue
            c = _json.loads(line[len("data: "):])["choices"][0]
            chunks.append(c["text"])
            if c["finish_reason"]:
                finish = c["finish_reason"]
    assert "".join(chunks) == blocking.json()["choices"][0]["text"]
    assert finish == "stop"


def test_openai_completions_streaming(client):
    """SSE streaming: data chunks concatenate to the non-streamed result and
    terminate with [DONE]."""
    with client.stream("POST", "/v1/completions", json={
            "prompt": "2 4 6 8", "max_tokens": 5, "temperature": 0,
            "stream": True}) as r:
        assert r.status_code == 200
        assert r.headers["content-type"].startswith("text/event-stream")
        chunks = []
        finish = None
        done = False
        for line in r.iter_lines():
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                done = True
                break
            import json as _json
            obj = _json.loads(payload)
            c = obj["choices"][0]
            chunks.append(c["text"])
            if c["finish_reason"]:
                finish = c["finish_reason"]
    assert done and finish in ("length", "stop")
    streamed = "".join(chunks)
    # Same prompt non-streamed (greedy): identical text.
    r2 = client.post("/v1/completions", json={
        "prompt": "2 4 6 8", "max_tokens": 5, "temperature": 0})
    assert r2.json()["choices"][0]["text"] == streamed


def _tiny_gpt2_tokenizer(tmp_path):
    """A REAL `transformers.GPT2Tokenizer` built offline: 128-entry
    byte-level-BPE vocab (94 printable bytes, 'Ġ', a few merged word
    tokens, and the three UTF-8 bytes of '€' so multi-byte codepoints can
    split across tokens)."""
    import json as _json

    from transformers import GPT2Tokenizer
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    b2u = bytes_to_unicode()
    toks = [b2u[b] for b in range(33, 127)]
    toks.append(b2u[32])
    toks += ["the", "Ġthe", "he", "th", "in", "ing", "Ġa"]
    toks += [b2u[b] for b in "€".encode()]
    for b in range(256):
        if len(toks) >= 128:
            break
        if b2u[b] not in toks:
            toks.append(b2u[b])
    vocab = {t: i for i, t in enumerate(toks)}
    assert len(vocab) == TINY.vocab_size
    vf, mf = tmp_path / "vocab.json", tmp_path / "merges.txt"
    vf.write_text(_json.dumps(vocab))
    mf.write_text("#version: 0.2\nt h\nth e\nĠ the\nh e\ni n\nin g\nĠ a\n")
    return GPT2Tokenizer(str(vf), str(mf))


def test_streaming_matches_blocking_with_real_bpe_tokenizer(tmp_path):
    """VERDICT r2 weak #8: suffix-only decoding glued with spaces diverges
    from `decode(all_tokens)` under real byte-level BPE (merges and
    multi-byte codepoints cross chunk boundaries). The stream must emit
    text diffs of the cumulative decode — concatenation equals the
    blocking result exactly."""
    tokenizer = _tiny_gpt2_tokenizer(tmp_path)
    cfg = EngineConfig(
        model=TINY,
        cache=CacheConfig(num_pages=32, page_size=4, max_pages_per_seq=8,
                          kv_dtype="float32"),
        scheduler=SchedulerConfig(max_decode_slots=2,
                                  prefill_buckets=(8, 16)),
        hf_model=None,
    )
    scheduler = Scheduler(LLMEngine(cfg))
    server = ServerThread(create_app(scheduler, tokenizer))
    url = server.start()
    try:
        with httpx.Client(base_url=url, timeout=60.0) as client:
            req = {"prompt": "the cat sat in the hat",
                   "max_tokens": 24, "temperature": 0.9, "seed": 5}
            with client.stream("POST", "/v1/completions",
                               json={**req, "stream": True}) as r:
                assert r.status_code == 200
                import json as _json
                chunks = []
                for line in r.iter_lines():
                    if not line.startswith("data: "):
                        continue
                    payload = line[len("data: "):]
                    if payload == "[DONE]":
                        break
                    chunks.append(
                        _json.loads(payload)["choices"][0]["text"])
            blocking = client.post("/v1/completions", json=req)
            expect = blocking.json()["choices"][0]["text"]
    finally:
        server.stop()
    assert "".join(chunks) == expect
    # The tiny model's random logits over a byte vocab make several
    # multi-char / cross-boundary deltas near-certain; sanity-check the
    # stream produced more than one chunk.
    assert len(chunks) >= 2
