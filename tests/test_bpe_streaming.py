"""Real byte-level BPE through the SSE streaming path (VERDICT r3 #10).

The round-2 SSE fix (decode-the-prefix + diff, hold back a trailing U+FFFD)
was only ever exercised with toy whitespace tokenizers, which cannot produce
the two behaviors the fix exists for: BPE merges spanning token boundaries
and multi-byte UTF-8 codepoints split ACROSS tokens. These tests drive the
real aiohttp server with `vllmini_tpu.utils.bpe.ByteBPETokenizer` — the
GPT-2 byte-level BPE algorithm (byte<->unicode bijection + ranked pair
merges + hub-format vocab.json/merges.txt loader) — and assert the streamed
concatenation is byte-identical to the blocking response.

Reference counterpart: none (the reference streams nothing and ships no
tokenizer tests); OpenAI-contract behavior is the spec here.
"""

import json
import threading

import httpx
import pytest

from vllmini_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SamplingParams,
    SchedulerConfig,
)
from vllmini_tpu.engine.engine import LLMEngine
from vllmini_tpu.engine.scheduler import Scheduler
from vllmini_tpu.server.api import create_app
from vllmini_tpu.utils.bpe import ByteBPETokenizer, bytes_to_unicode

from test_server import ServerThread

CORPUS = (
    "the theme of the day is the theater the thing about the weather "
    "hello hello world world streaming streaming tokens tokens merge "
    "merge boundary boundary the quick brown fox jumps over the lazy dog "
) * 4


def trained():
    return ByteBPETokenizer.train(CORPUS, num_merges=80,
                                  eos_token="<|endoftext|>")


# ---------------------------------------------------------------- unit level

def test_roundtrip_ascii_and_unicode():
    tok = trained()
    for s in ["the theme of the day", "hello world", "café naïve",
              "emoji \U0001f30d end", "tabs\tand\nnewlines  spaces",
              "mixed 123 punctuation!?", ""]:
        assert tok.decode(tok.encode(s)) == s


def test_merges_are_real():
    """Training actually merged something: a frequent word is fewer tokens
    than its byte count, and its token crosses what would be byte
    boundaries."""
    tok = trained()
    ids = tok.encode("the")
    assert len(ids) < 3  # 'the' is 3 bytes; BPE merged it
    # A merged token decodes to a multi-byte string on its own.
    assert any(len(tok.decode([i])) > 1 for i in ids) or len(ids) == 1


def test_split_codepoint_yields_replacement_char():
    """Byte-level property the SSE holdback exists for: a prefix of the id
    stream that ends mid-codepoint decodes with a trailing U+FFFD, and the
    concatenation of piecewise decodes differs from the full decode."""
    tok = ByteBPETokenizer.byte_only()
    b2u = bytes_to_unicode()
    ids = [tok.vocab[b2u[b]] for b in "\U0001f30d".encode()]  # 4 byte tokens
    assert len(ids) == 4
    full = tok.decode(ids)
    assert full == "\U0001f30d"
    head = tok.decode(ids[:2])
    assert head.endswith("�")
    assert head + tok.decode(ids[2:]) != full  # naive suffix decode diverges


def test_hub_file_format_roundtrip(tmp_path):
    """from_files consumes the exact on-disk format of GPT-2 checkpoints
    (vocab.json + merges.txt with a #version header)."""
    tok = trained()
    merges = sorted(tok.ranks, key=tok.ranks.get)
    (tmp_path / "vocab.json").write_text(json.dumps(tok.vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{l} {r}" for l, r in merges) + "\n")
    tok2 = ByteBPETokenizer.from_files(str(tmp_path / "vocab.json"),
                                       str(tmp_path / "merges.txt"))
    s = "the theme of the \U0001f30d day"
    assert tok2.encode(s) == tok.encode(s)
    assert tok2.decode(tok2.encode(s)) == s
    assert tok2.eos_token_id == tok.vocab["<|endoftext|>"]


# ------------------------------------------------- scripted server streaming

class _ScriptedSeq:
    def __init__(self, script):
        self.script = list(script)
        self.output_ids = []
        self.fork_group = []

    @property
    def is_finished(self):
        return len(self.output_ids) >= len(self.script)

    finish_reason = None  # server maps None -> "length"


class _ScriptedScheduler:
    """Minimal scheduler stand-in that reveals a SCRIPTED id stream one token
    per engine tick — the only way to force a specific byte sequence through
    the real SSE handler (a real model's outputs can't be chosen)."""

    def __init__(self, script):
        self._script = list(script)
        self.seqs = {}
        self._next = 1
        self.has_work = True

    def add_request(self, ids, sampling):
        sid = self._next
        self._next += 1
        self.seqs[sid] = _ScriptedSeq(self._script)
        return sid

    def get(self, sid):
        return self.seqs.get(sid)

    def step(self):
        for s in self.seqs.values():
            if not s.is_finished:
                s.output_ids.append(s.script[len(s.output_ids)])

    def abort(self, sid):
        s = self.seqs.get(sid)
        if s is not None:
            s.script = list(s.output_ids)

    def pop_finished(self, sid):
        self.seqs.pop(sid, None)


def _stream_deltas(client, payload):
    texts = []
    with client.stream("POST", "/v1/completions", json=payload) as r:
        assert r.status_code == 200
        for line in r.iter_lines():
            if not line.startswith("data: "):
                continue
            data = line[len("data: "):]
            if data == "[DONE]":
                break
            texts.append(json.loads(data)["choices"][0]["text"])
    return texts


@pytest.mark.parametrize("text", [
    "Hi \U0001f30d! café",          # emoji split across byte tokens
    "\U0001f30d\U0001f30d",              # back-to-back 4-byte codepoints
    "aé€\U0001f30d end",       # 1-, 2-, 3-, 4-byte codepoints
])
def test_sse_stream_matches_full_decode_one_token_per_tick(text):
    """One byte-token per tick is the adversarial schedule: every multi-byte
    codepoint is mid-flight at some poll, so the trailing-U+FFFD holdback
    must engage. Streamed concat must equal the full decode exactly."""
    tok = ByteBPETokenizer.byte_only()
    b2u = bytes_to_unicode()
    script = [tok.vocab[b2u[b]] for b in text.encode()]
    sched = _ScriptedScheduler(script)
    server = ServerThread(create_app(sched, tok))
    url = server.start()
    try:
        with httpx.Client(base_url=url, timeout=30.0) as client:
            deltas = _stream_deltas(client, {
                "prompt": "x", "max_tokens": len(script), "stream": True})
        streamed = "".join(deltas)
        assert streamed == text
        assert "�" not in streamed
    finally:
        server.stop()


def test_sse_never_emits_partial_codepoint_midstream():
    """Each individual delta must already be valid text: no delta may end
    with U+FFFD except possibly the last (a stream truncated mid-codepoint
    by max_tokens is allowed to surface the replacement char at the end)."""
    text = "x\U0001f30dy€z"
    tok = ByteBPETokenizer.byte_only()
    b2u = bytes_to_unicode()
    script = [tok.vocab[b2u[b]] for b in text.encode()]
    sched = _ScriptedScheduler(script)
    server = ServerThread(create_app(sched, tok))
    url = server.start()
    try:
        with httpx.Client(base_url=url, timeout=30.0) as client:
            deltas = _stream_deltas(client, {
                "prompt": "x", "max_tokens": len(script), "stream": True})
        for d in deltas[:-1]:
            assert not d.endswith("�")
    finally:
        server.stop()


# ------------------------------------------------- real engine, real server

def test_real_engine_stream_equals_blocking_with_bpe():
    """End-to-end: tiny REAL model + trained BPE tokenizer; the streamed SSE
    concatenation must equal the blocking /v1/completions text for the same
    greedy request (VERDICT r3 #10's literal ask)."""
    tok = trained()
    vocab = len(tok.vocab)
    model = ModelConfig(family="gpt2", vocab_size=vocab, hidden_size=32,
                        num_layers=2, num_heads=2,
                        max_position_embeddings=128, dtype="float32")
    cfg = EngineConfig(
        model=model,
        cache=CacheConfig(num_pages=64, page_size=4, max_pages_per_seq=16,
                          kv_dtype="float32"),
        scheduler=SchedulerConfig(max_decode_slots=2,
                                  prefill_buckets=(8, 16, 32)),
        hf_model=None,
    )
    scheduler = Scheduler(LLMEngine(cfg))
    server = ServerThread(create_app(scheduler, tok))
    url = server.start()
    try:
        with httpx.Client(base_url=url, timeout=120.0) as client:
            req = {"prompt": "the theme of the day",
                   "max_tokens": 24, "temperature": 0}
            blocking = client.post("/v1/completions", json=req)
            assert blocking.status_code == 200
            expect = blocking.json()["choices"][0]["text"]
            deltas = _stream_deltas(client, {**req, "stream": True})
            assert "".join(deltas) == expect
    finally:
        server.stop()
