"""HTTP serving layer (aiohttp; this image has no fastapi/uvicorn).

Reference counterpart: `/root/reference/vllmini/server.py` — same two-endpoint
contract so the reference's curl flow (`README.md:26-31`) works unchanged:

    POST /generate {"prompt": ..., "max_length": N} -> {"sequence_id": id}
    GET  /result/{seq_id} -> {"status": "in progress"|"completed", "generated": text}

Deliberate fixes over the reference (documented in SURVEY.md "bugs"):
- prefill does NOT run on the event loop (`server.py:81` blocks all HTTP handling
  there); the engine loop runs in a dedicated thread and /generate only enqueues;
- request `max_length` is honored (the reference ignores it, `server.py:13-14`);
- unknown sequence id returns HTTP 404, not a 200 "error" body (`server.py:104`);
- fetching a completed result does NOT delete it (one-shot reads at
  `server.py:101-102`); an explicit DELETE /result/{id} frees it instead.

Additions: /healthz, /metrics, /v1/generate with full sampling params, DELETE
(abort), graceful shutdown.
"""

from __future__ import annotations

import logging
import threading
import time
from typing import Optional

from aiohttp import web

from ..config import SamplingParams
from ..engine.scheduler import Scheduler
from ..engine.sequence import SequenceState

logger = logging.getLogger("vllmini_tpu.server")


class EngineLoop:
    """Background thread driving Scheduler.step(); all scheduler access is
    serialized through `self.lock` (the engine objects are not thread-safe)."""

    def __init__(self, scheduler: Scheduler, idle_sleep_s: float = 0.002,
                 driver=None):
        self.scheduler = scheduler
        # Multi-host: a parallel.multihost.PrimaryDriver wrapping the step so
        # every tick's device-command log is broadcast to worker hosts. The
        # loop then ticks even when idle (workers block on the broadcast).
        self.driver = driver
        self.lock = threading.Lock()
        self.idle_sleep_s = idle_sleep_s
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        # Event-driven request waits (VERDICT r2 weak #9): handlers await a
        # tick pulse instead of polling at 10 ms. The engine thread pulses
        # the asyncio loop after every productive step.
        self._aio_loop = None
        self._tick_event = None

    def bind_aio(self, aio_loop) -> None:
        """Attach the server's running asyncio loop (call from on_startup)."""
        import asyncio

        self._aio_loop = aio_loop
        self._tick_event = asyncio.Event()

    def _pulse(self) -> None:
        if self._aio_loop is not None:
            try:
                self._aio_loop.call_soon_threadsafe(self._pulse_in_loop)
            except RuntimeError:
                pass  # loop already closed (shutdown race)

    def _pulse_in_loop(self) -> None:
        import asyncio

        ev, self._tick_event = self._tick_event, asyncio.Event()
        if ev is not None:
            ev.set()

    async def wait_tick(self, timeout: float = 0.1) -> None:
        """Await the next engine tick (or `timeout` seconds). Falls back to
        a short sleep when no asyncio loop was bound."""
        import asyncio

        ev = self._tick_event
        if ev is None:
            await asyncio.sleep(0.01)
            return
        try:
            await asyncio.wait_for(asyncio.shield(ev.wait()), timeout)
        except asyncio.TimeoutError:
            pass

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="engine-loop")
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)

    def _run(self):
        while not self._stop.is_set():
            with self.lock:
                has_work = self.scheduler.has_work
                if has_work or self.driver is not None:
                    try:
                        if self.driver is not None:
                            self.driver.step()
                        else:
                            self.scheduler.step()
                    except Exception:
                        logger.exception("engine step failed")
            if has_work:
                self._pulse()
            else:
                time.sleep(self.idle_sleep_s)
        if self.driver is not None:
            self.driver.shutdown()


def _json_error(status: int, detail: str) -> web.Response:
    return web.json_response({"detail": detail}, status=status)


def create_app(scheduler: Scheduler, tokenizer, *,
               eos_token_id=None, driver=None) -> web.Application:
    """Build the app around an existing scheduler + tokenizer.

    `tokenizer` needs `encode(str) -> list[int]` and `decode(list[int]) -> str`;
    `eos_token_id` defaults to `tokenizer.eos_token_id` when present.
    `driver` (multi-host): PrimaryDriver broadcasting each tick to workers.
    """
    if eos_token_id is None:
        eos_token_id = getattr(tokenizer, "eos_token_id", None)
    idle = 0.002 if driver is None else 0.01
    loop = EngineLoop(scheduler, idle_sleep_s=idle, driver=driver)

    app = web.Application()
    app["engine_loop"] = loop
    app["scheduler"] = scheduler

    async def on_startup(app):
        import asyncio

        loop.bind_aio(asyncio.get_running_loop())
        loop.start()

    async def on_cleanup(app):
        loop.stop()

    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)

    def _submit(prompt: str, sampling: SamplingParams):
        try:
            ids = tokenizer.encode(prompt)
        except Exception as e:  # tokenizer rejects the text -> client error
            return None, _json_error(400, f"tokenization failed: {e}")
        with loop.lock:
            try:
                return scheduler.add_request(ids, sampling), None
            except ValueError as e:
                return None, _json_error(400, str(e))
            except RuntimeError as e:
                return None, _json_error(429, str(e))

    async def generate(request: web.Request) -> web.Response:
        try:
            body = await request.json()
            prompt = body["prompt"]
            max_length = int(body.get("max_length", 20))
            assert isinstance(prompt, str) and max_length >= 1
        except Exception:
            return _json_error(400, "expected {prompt: str, max_length: int>=1}")
        stop = (eos_token_id,) if eos_token_id is not None else ()
        sid, err = _submit(prompt, SamplingParams(
            max_new_tokens=max_length, stop_token_ids=stop))
        if err is not None:
            return err
        return web.json_response({"sequence_id": sid})

    async def generate_v1(request: web.Request) -> web.Response:
        try:
            body = await request.json()
            prompt = body["prompt"]
            assert isinstance(prompt, str)
            max_new = int(body.get("max_new_tokens", 20))
            temperature = float(body.get("temperature", 1.0))
            top_k = int(body.get("top_k", 50))
            top_p = float(body.get("top_p", 1.0))
            greedy = bool(body.get("greedy", False))
            stop = [int(t) for t in body.get("stop_token_ids", [])]
            seed = body.get("seed")
            n = int(body.get("n", 1))
            assert max_new >= 1 and temperature >= 0 and 0 < top_p <= 1.0
            assert n >= 1
        except Exception:
            return _json_error(400, "malformed generate request")
        if eos_token_id is not None and eos_token_id not in stop:
            stop.append(eos_token_id)
        sid, err = _submit(prompt, SamplingParams(
            max_new_tokens=max_new, temperature=temperature, top_k=top_k,
            top_p=top_p, greedy=greedy, stop_token_ids=tuple(stop),
            seed=None if seed is None else int(seed), n=n))
        if err is not None:
            return err
        resp = {"sequence_id": sid}
        if n > 1:
            # n-best: the fork siblings' ids, fetchable via /result/{id}.
            with loop.lock:
                parent = scheduler.get(sid)
                resp["sequence_ids"] = list(parent.fork_group)
        return web.json_response(resp)

    async def get_result(request: web.Request) -> web.Response:
        try:
            seq_id = int(request.match_info["seq_id"])
        except ValueError:
            return _json_error(400, "sequence id must be an integer")
        with loop.lock:
            seq = scheduler.get(seq_id)
            if seq is None:
                return _json_error(404, f"unknown sequence {seq_id}")
            generated = list(seq.generated_ids())
            state = seq.state
            reason = seq.finish_reason
        text = tokenizer.decode(generated) if generated else ""
        status = "completed" if state in (
            SequenceState.FINISHED, SequenceState.FAILED) else "in progress"
        return web.json_response({
            "status": status,
            "generated": text,
            "finish_reason": reason.value if reason else None,
            "num_generated": len(generated),
        })

    async def delete_result(request: web.Request) -> web.Response:
        try:
            seq_id = int(request.match_info["seq_id"])
        except ValueError:
            return _json_error(400, "sequence id must be an integer")
        with loop.lock:
            seq = scheduler.get(seq_id)
            if seq is None:
                return _json_error(404, f"unknown sequence {seq_id}")
            if not seq.is_finished:
                scheduler.abort(seq_id)
            scheduler.pop_finished(seq_id)
        return web.json_response({"ok": True})

    async def completions(request: web.Request) -> web.Response:
        """OpenAI-compatible `/v1/completions` (non-streaming): submit,
        poll-wait for completion, return the standard envelope. The native
        async surface (`/generate` + `/result`) remains the primary API;
        this adapter exists so OpenAI-client tooling can point at the
        server unchanged."""
        import asyncio
        import json
        import time as _time
        import uuid

        try:
            body = await request.json()
            prompt = body["prompt"]
            # OpenAI accepts one string or a list of strings (M prompts x n
            # completions -> M*n choices, prompt-major indices).
            prompts = prompt if isinstance(prompt, list) else [prompt]
            assert prompts and all(isinstance(p, str) for p in prompts)
            max_new = int(body.get("max_tokens", 16))
            temperature = float(body.get("temperature", 1.0))
            top_p = float(body.get("top_p", 1.0))
            n = int(body.get("n", 1))
            seed = body.get("seed")
            echo = bool(body.get("echo", False))
            logprobs = body.get("logprobs")
            if logprobs is not None:
                logprobs = int(logprobs)
                assert 0 <= logprobs <= 5
            stop_strs = body.get("stop") or []
            if isinstance(stop_strs, str):
                stop_strs = [stop_strs]
            assert (isinstance(stop_strs, list) and len(stop_strs) <= 4
                    and all(isinstance(s, str) and s for s in stop_strs))
            stream = bool(body.get("stream", False))
            timeout_s = float(body.get("timeout", 120.0))
            assert max_new >= 1 and temperature >= 0 and 0 < top_p <= 1.0
            assert n >= 1
            assert not (stream and n > 1), "stream supports n == 1"
            assert not (stream and logprobs is not None), \
                "logprobs not supported with stream"
            assert not (stream and len(prompts) > 1), \
                "stream supports a single prompt"
        except Exception:
            return _json_error(400, "malformed completions request")
        stop = [eos_token_id] if eos_token_id is not None else []
        sampling = SamplingParams(
            max_new_tokens=max_new, temperature=temperature, top_p=top_p,
            greedy=(temperature == 0), stop_token_ids=tuple(stop),
            seed=None if seed is None else int(seed), n=n,
            logprobs=logprobs is not None)
        sids = []
        for p in prompts:
            sid, err = _submit(p, sampling)
            if err is not None:
                with loop.lock:  # roll back earlier prompts of the batch
                    for s in sids:
                        scheduler.abort(s)
                        scheduler.pop_finished(s)
                return err
            sids.append(sid)
        sid = sids[0]
        with loop.lock:
            # choice order: prompt-major, then the n fork completions.
            group = [i for s in sids
                     for i in (list(scheduler.get(s).fork_group) or [s])]
        deadline = _time.monotonic() + timeout_s
        cmpl_id = f"cmpl-{uuid.uuid4().hex[:24]}"
        model_name = request.app.get("model_name", "vllmini-tpu")

        def find_stop(text: str):
            """Earliest stop-string hit in `text` -> index or None (stop
            sequences are excluded from the returned text, OpenAI-style)."""
            hits = [text.find(s) for s in stop_strs]
            hits = [h for h in hits if h >= 0]
            return min(hits) if hits else None

        if stream:
            # SSE stream of incremental text deltas, OpenAI-style: one
            # `data: {...}` chunk per new token batch, then `[DONE]`.
            resp = web.StreamResponse(headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache"})
            await resp.prepare(request)
            # Incremental detokenization: BPE merges can span token
            # boundaries, so decoding only the new suffix tokens diverges
            # from `decode(all_tokens)` (ADVICE r2). Instead decode the full
            # generated prefix each poll and emit the TEXT diff; hold back a
            # trailing U+FFFD, which means a multi-byte codepoint is still
            # incomplete under a byte-level BPE.
            sent_toks = 0
            sent_text = ""
            # While a stop string could still be completing across chunk
            # boundaries, hold back its longest proper prefix.
            holdback = max((len(s) - 1 for s in stop_strs), default=0)
            stopped = False
            if echo:
                first = {"id": cmpl_id, "object": "text_completion",
                         "created": int(_time.time()), "model": model_name,
                         "choices": [{"index": 0, "text": prompts[0],
                                      "finish_reason": None,
                                      "logprobs": None}]}
                await resp.write(b"data: " + json.dumps(first).encode()
                                 + b"\n\n")
            try:
                while True:
                    with loop.lock:
                        sq = scheduler.get(sid)
                        if sq is None:
                            break
                        toks = list(sq.output_ids)
                        done = sq.is_finished
                        reason = sq.finish_reason
                    if toks and (len(toks) > sent_toks or done):
                        full = tokenizer.decode(toks)
                        upto = len(full)
                        if not done and full.endswith("�"):
                            upto -= 1
                        hit = find_stop(full[:upto]) if stop_strs else None
                        if hit is not None:
                            upto, done, stopped = hit, True, True
                            with loop.lock:
                                scheduler.abort(sid)
                        elif not done:
                            upto = max(len(sent_text), upto - holdback)
                        delta = full[len(sent_text):upto]
                        sent_toks = len(toks)
                        if delta:
                            sent_text = full[:upto]
                            chunk = {"id": cmpl_id,
                                     "object": "text_completion",
                                     "created": int(_time.time()),
                                     "model": model_name,
                                     "choices": [{"index": 0, "text": delta,
                                                  "finish_reason": None,
                                                  "logprobs": None}]}
                            await resp.write(
                                b"data: " + json.dumps(chunk).encode()
                                + b"\n\n")
                    if done:
                        fin = {"id": cmpl_id, "object": "text_completion",
                               "created": int(_time.time()),
                               "model": model_name,
                               "choices": [{
                                   "index": 0, "text": "",
                                   "finish_reason": (
                                       "stop" if stopped
                                       or (reason is not None
                                           and reason.value == "stop_token")
                                       else "length"),
                                   "logprobs": None}]}
                        await resp.write(
                            b"data: " + json.dumps(fin).encode() + b"\n\n")
                        with loop.lock:
                            scheduler.pop_finished(sid)
                        break
                    if _time.monotonic() > deadline:
                        break
                    await loop.wait_tick()
                await resp.write(b"data: [DONE]\n\n")
            finally:
                with loop.lock:
                    sq = scheduler.get(sid)
                    if sq is not None and not sq.is_finished:
                        scheduler.abort(sid)  # client gone / timed out
            await resp.write_eof()
            return resp

        stopped: set = set()  # seq ids truncated by a stop string
        while True:
            with loop.lock:
                seqs = [scheduler.get(i) for i in group]
                if all(sq is not None and sq.is_finished for sq in seqs):
                    break
                if any(sq is None for sq in seqs):
                    return _json_error(500, "sequence evicted before fetch")
                if stop_strs:
                    # Early abort: stop decoding a sequence as soon as its
                    # text contains a stop string (the final truncation
                    # below re-scans, so pipeline-lag extra tokens are fine).
                    for i, sq in zip(group, seqs):
                        if (i not in stopped and not sq.is_finished
                                and sq.output_ids and find_stop(
                                    tokenizer.decode(sq.output_ids))
                                is not None):
                            stopped.add(i)
                            scheduler.abort(i)
            if _time.monotonic() > deadline:
                # Timed-out requests must not keep occupying decode slots
                # and pool pages until natural completion (ADVICE r2).
                with loop.lock:
                    for i in group:
                        sq = scheduler.get(i)
                        if sq is not None and not sq.is_finished:
                            scheduler.abort(i)
                        if sq is not None:
                            scheduler.pop_finished(i)
                return _json_error(504, "generation timed out")
            await loop.wait_tick()
        with loop.lock:
            choices = []
            prompt_tokens = sum(len(tokenizer.encode(p)) for p in prompts)
            completion_tokens = 0
            for i, sq in enumerate(seqs):
                gen = sq.output_ids
                completion_tokens += len(gen)
                reason = sq.finish_reason
                ptext = ""
                if echo:
                    # Echo decodes prompt+completion ids TOGETHER: two
                    # independently decoded strings lose the boundary
                    # (BPE merges / separators span it), e.g. the toy
                    # tokenizer's "1 2 3"+"29990" -> "1 2 329990".
                    pids = list(tokenizer.encode(prompts[i // n]))
                    ptext = tokenizer.decode(pids)
                    full = (tokenizer.decode(pids + list(gen))
                            if gen else ptext)
                    text = full[len(ptext):]
                else:
                    text = tokenizer.decode(gen) if gen else ""
                hit = find_stop(text) if stop_strs else None
                if hit is not None:
                    text = text[:hit]
                lp_obj = None
                if logprobs is not None:
                    # Per-token view: device-captured log-prob of each
                    # SAMPLED token (raw log-softmax, OpenAI semantics);
                    # top_logprobs reports the sampled token (top-1 view).
                    tok_strs = [tokenizer.decode([t]) for t in gen]
                    lps = sq.generated_logprobs()[: len(gen)]
                    offs, pos = [], len(ptext) if echo else 0
                    keep = len(gen)
                    cum = 0
                    for j, tstr in enumerate(tok_strs):
                        offs.append(pos + cum)
                        cum += len(tstr)
                        if hit is not None and cum > hit:
                            keep = j + 1
                            break
                    lp_obj = {
                        "tokens": tok_strs[:keep],
                        "token_logprobs": [round(x, 6)
                                           for x in lps[:keep]],
                        "top_logprobs": ([
                            {ts: round(x, 6)}
                            for ts, x in zip(tok_strs[:keep], lps[:keep])]
                            if logprobs >= 1 else None),
                        "text_offset": offs[:keep],
                    }
                choices.append({
                    "index": i,
                    "text": (ptext + text) if echo else text,
                    "finish_reason": ("stop" if hit is not None
                                      or (reason is not None
                                          and reason.value == "stop_token")
                                      else "length"),
                    "logprobs": lp_obj,
                })
                scheduler.pop_finished(sq.seq_id)
        return web.json_response({
            "id": cmpl_id,
            "object": "text_completion",
            "created": int(_time.time()),
            "model": model_name,
            "choices": choices,
            "usage": {
                "prompt_tokens": prompt_tokens,
                "completion_tokens": completion_tokens,
                "total_tokens": prompt_tokens + completion_tokens,
            },
        })

    def _chat_prompt(messages) -> str:
        """Render a chat transcript to a prompt: the tokenizer's own chat
        template when it has one, else a plain role-tagged fallback (the
        vLLM default-template spirit) ending with the assistant header."""
        tmpl = getattr(tokenizer, "apply_chat_template", None)
        if callable(tmpl):
            try:
                return tmpl(messages, tokenize=False,
                            add_generation_prompt=True)
            except Exception:
                pass
        lines = [f"{m['role']}: {m['content']}" for m in messages]
        return "\n".join(lines) + "\nassistant:"

    async def chat_completions(request: web.Request) -> web.Response:
        """OpenAI-compatible `/v1/chat/completions` — blocking and SSE
        streaming (stream requires n == 1); `stop` strings, seeded sampling,
        n choices, `logprobs` (chat format: per-token content entries with
        device-captured log-probs), usage accounting."""
        import asyncio
        import json
        import time as _time
        import uuid
        try:
            body = await request.json()
            messages = body["messages"]
            assert (isinstance(messages, list) and messages
                    and all(isinstance(m, dict) and "role" in m
                            and "content" in m for m in messages))
            max_new = int(body.get("max_completion_tokens",
                                   body.get("max_tokens", 16)))
            temperature = float(body.get("temperature", 1.0))
            top_p = float(body.get("top_p", 1.0))
            n = int(body.get("n", 1))
            seed = body.get("seed")
            want_logprobs = bool(body.get("logprobs", False))
            stop_strs = body.get("stop") or []
            if isinstance(stop_strs, str):
                stop_strs = [stop_strs]
            assert (isinstance(stop_strs, list) and len(stop_strs) <= 4
                    and all(isinstance(s, str) and s for s in stop_strs))
            stream = bool(body.get("stream", False))
            timeout_s = float(body.get("timeout", 120.0))
            assert max_new >= 1 and temperature >= 0 and 0 < top_p <= 1.0
            assert n >= 1 and not (stream and n > 1)
            assert not (stream and want_logprobs)
        except Exception:
            return _json_error(400, "malformed chat completions request")
        prompt = _chat_prompt(messages)
        stop = [eos_token_id] if eos_token_id is not None else []
        sid, err = _submit(prompt, SamplingParams(
            max_new_tokens=max_new, temperature=temperature, top_p=top_p,
            greedy=(temperature == 0), stop_token_ids=tuple(stop),
            seed=None if seed is None else int(seed), n=n,
            logprobs=want_logprobs))
        if err is not None:
            return err
        with loop.lock:
            group = list(scheduler.get(sid).fork_group) or [sid]
        deadline = _time.monotonic() + timeout_s
        cmpl_id = f"chatcmpl-{uuid.uuid4().hex[:24]}"
        model_name = request.app.get("model_name", "vllmini-tpu")

        def find_stop(text: str):
            hits = [text.find(s) for s in stop_strs]
            hits = [h for h in hits if h >= 0]
            return min(hits) if hits else None

        if stream:
            resp = web.StreamResponse(headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache"})
            await resp.prepare(request)

            def chunk(delta, finish=None):
                return b"data: " + json.dumps({
                    "id": cmpl_id, "object": "chat.completion.chunk",
                    "created": int(_time.time()), "model": model_name,
                    "choices": [{"index": 0, "delta": delta,
                                 "finish_reason": finish}]}).encode() \
                    + b"\n\n"

            await resp.write(chunk({"role": "assistant"}))
            sent_text = ""
            holdback = max((len(s) - 1 for s in stop_strs), default=0)
            stopped = False
            try:
                while True:
                    with loop.lock:
                        sq = scheduler.get(sid)
                        if sq is None:
                            break
                        toks = list(sq.output_ids)
                        done = sq.is_finished
                        reason = sq.finish_reason
                    full = tokenizer.decode(toks) if toks else ""
                    upto = len(full)
                    if not done and full.endswith("�"):
                        upto -= 1
                    hit = find_stop(full[:upto]) if stop_strs else None
                    if hit is not None:
                        upto, done, stopped = hit, True, True
                        with loop.lock:
                            scheduler.abort(sid)
                    elif not done:
                        upto = max(len(sent_text), upto - holdback)
                    delta = full[len(sent_text):upto]
                    if delta:
                        sent_text = full[:upto]
                        await resp.write(chunk({"content": delta}))
                    if done:
                        await resp.write(chunk({}, finish=(
                            "stop" if stopped or (
                                reason is not None
                                and reason.value == "stop_token")
                            else "length")))
                        await resp.write(b"data: [DONE]\n\n")
                        break
                    if _time.monotonic() > deadline:
                        break
                    await loop.wait_tick()
            finally:
                with loop.lock:
                    if scheduler.get(sid) is not None:
                        scheduler.abort(sid)
                        scheduler.pop_finished(sid)
            await resp.write_eof()
            return resp

        stopped: set = set()
        while True:
            with loop.lock:
                seqs = [scheduler.get(i) for i in group]
                if all(sq is not None and sq.is_finished for sq in seqs):
                    break
                if any(sq is None for sq in seqs):
                    return _json_error(500, "sequence evicted before fetch")
                if stop_strs:
                    for i, sq in zip(group, seqs):
                        if (i not in stopped and not sq.is_finished
                                and sq.output_ids and find_stop(
                                    tokenizer.decode(sq.output_ids))
                                is not None):
                            stopped.add(i)
                            scheduler.abort(i)
            if _time.monotonic() > deadline:
                with loop.lock:
                    for i in group:
                        scheduler.abort(i)
                        scheduler.pop_finished(i)
                return _json_error(504, "generation timed out")
            await loop.wait_tick()
        with loop.lock:
            choices = []
            prompt_tokens = len(tokenizer.encode(prompt))
            completion_tokens = 0
            for i, sq in enumerate(seqs):
                gen = sq.output_ids
                completion_tokens += len(gen)
                reason = sq.finish_reason
                text = tokenizer.decode(gen) if gen else ""
                hit = find_stop(text) if stop_strs else None
                if hit is not None:
                    text = text[:hit]
                lp_obj = None
                if want_logprobs:
                    tok_strs = [tokenizer.decode([t]) for t in gen]
                    lps = sq.generated_logprobs()[: len(gen)]
                    keep, cum = len(gen), 0
                    for j, ts in enumerate(tok_strs):
                        cum += len(ts)
                        if hit is not None and cum > hit:
                            keep = j + 1
                            break
                    lp_obj = {"content": [
                        {"token": ts, "logprob": round(x, 6),
                         "top_logprobs": [
                             {"token": ts, "logprob": round(x, 6)}]}
                        for ts, x in zip(tok_strs[:keep], lps[:keep])]}
                choices.append({
                    "index": i,
                    "message": {"role": "assistant", "content": text},
                    "finish_reason": ("stop" if hit is not None
                                      or (reason is not None
                                          and reason.value == "stop_token")
                                      else "length"),
                    "logprobs": lp_obj,
                })
        return web.json_response({
            "id": cmpl_id, "object": "chat.completion",
            "created": int(_time.time()), "model": model_name,
            "choices": choices,
            "usage": {"prompt_tokens": prompt_tokens,
                      "completion_tokens": completion_tokens,
                      "total_tokens": prompt_tokens + completion_tokens},
        })

    async def healthz(request: web.Request) -> web.Response:
        return web.json_response({"status": "ok"})

    async def metrics(request: web.Request) -> web.Response:
        snap = scheduler.engine.metrics.snapshot()
        with loop.lock:
            snap["num_running"] = scheduler.num_running
            snap["num_waiting"] = len(scheduler.waiting)
            snap["num_swapped"] = len(scheduler.swapped)
            snap["free_pages"] = scheduler.engine.num_free_pages
            snap.update(scheduler.engine.spec_stats())
        return web.json_response(snap)

    async def convert_kv(request: web.Request) -> web.Response:
        """Admin: re-precision the warm KV cache in place (e.g. bf16 -> int8
        halves KV bytes without evicting any sequence). Body:
        {"kv_dtype": "int8" | "bfloat16" | "float32" | "fp8_e4m3" | ...}."""
        try:
            body = await request.json()
        except Exception:
            return _json_error(400, "invalid JSON body")
        kv_dtype = body.get("kv_dtype")
        if not isinstance(kv_dtype, str):
            return _json_error(400, "missing 'kv_dtype'")
        with loop.lock:
            try:
                info = scheduler.convert_kv_dtype(kv_dtype)
            except (ValueError, TypeError) as e:
                return _json_error(400, str(e))
            except RuntimeError as e:
                return _json_error(409, str(e))
        return web.json_response(info)

    app.router.add_post("/admin/convert_kv", convert_kv)
    app.router.add_post("/generate", generate)
    app.router.add_post("/v1/generate", generate_v1)
    app.router.add_post("/v1/completions", completions)
    app.router.add_post("/v1/chat/completions", chat_completions)
    app.router.add_get("/result/{seq_id}", get_result)
    app.router.add_delete("/result/{seq_id}", delete_result)
    app.router.add_get("/healthz", healthz)
    app.router.add_get("/metrics", metrics)
    return app


def run_app(app: web.Application, host: str, port: int) -> None:
    web.run_app(app, host=host, port=port)
