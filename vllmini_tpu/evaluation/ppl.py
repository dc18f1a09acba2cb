"""Perplexity evaluation harness.

The quantization quality gate (BASELINE.json: "match FP16 reference perplexity
within 0.1 PPL at the same bit-width"). The reference has no eval harness at all
(SURVEY.md §4 gaps: "no determinism or PPL checks").

Scores token streams window-by-window through the cache-less scoring mode of the
model prefill (`return_all_logits=True`, `pool=None`), accumulating token NLL in
fp32. `delta_ppl` compares two parameter sets (e.g. fp16 vs int8-weight) on the
same stream.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.registry import get_family


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def _window_nll(params, token_ids, seq_len, *, config: ModelConfig,
                interpret: bool):
    """Sum NLL (nats) of tokens 1..seq_len-1 given their prefixes, plus count."""
    family = get_family(config)
    logits, _ = family.prefill_forward(
        params, config, None, token_ids, seq_len, page_table=None,
        interpret=interpret, return_all_logits=True)  # [L, vocab] f32
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    L = token_ids.shape[0]
    targets = jnp.roll(token_ids, -1)  # target[i] = token[i+1]
    tok_lp = jnp.take_along_axis(logprobs, targets[:, None], axis=1)[:, 0]
    valid = jnp.arange(L) < (seq_len - 1)
    nll = -jnp.sum(jnp.where(valid, tok_lp, 0.0))
    return nll, jnp.sum(valid)


def perplexity(params, config: ModelConfig, token_ids: Sequence[int], *,
               window: int = 512, interpret: Optional[bool] = None) -> float:
    """Windowed (non-overlapping) perplexity of a token stream."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    ids = np.asarray(token_ids, np.int32)
    if len(ids) < 2:
        raise ValueError("need at least 2 tokens")
    total_nll, total_count = 0.0, 0
    for start in range(0, len(ids), window):
        chunk = ids[start: start + window]
        if len(chunk) < 2:
            break
        padded = np.zeros(window, np.int32)
        padded[: len(chunk)] = chunk
        nll, count = _window_nll(
            params, jnp.asarray(padded), jnp.int32(len(chunk)),
            config=config, interpret=interpret)
        total_nll += float(nll)
        total_count += int(count)
    return math.exp(total_nll / max(total_count, 1))


def delta_ppl(params_a, params_b, config: ModelConfig,
              token_ids: Sequence[int], *, window: int = 512,
              interpret: Optional[bool] = None):
    """Returns (ppl_a, ppl_b, ppl_b - ppl_a)."""
    a = perplexity(params_a, config, token_ids, window=window,
                   interpret=interpret)
    b = perplexity(params_b, config, token_ids, window=window,
                   interpret=interpret)
    return a, b, b - a


def decode_perplexity(params, config: ModelConfig, cache_config,
                      token_ids: Sequence[int], *, window: int = 256,
                      interpret: Optional[bool] = None) -> float:
    """Windowed perplexity measured through the SERVING decode path: tokens
    are teacher-forced one step at a time through `decode_forward` over a
    real paged KV pool (fused write, kernel-side dequant for int8/fp8
    pools). This is the number the KV-cache quantization gate cares about —
    the prefill-based `perplexity` never touches the pool.
    """
    import dataclasses as _dc

    from ..memory.kv_cache import create_kv_pool

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    ids = np.asarray(token_ids, np.int32)
    B = len(ids) // window
    if B < 1:
        raise ValueError("stream shorter than one window")
    ids = ids[: B * window].reshape(B, window)

    pages_per_win = -(-window // cache_config.page_size)
    cache = _dc.replace(cache_config, num_pages=B * pages_per_win,
                        max_pages_per_seq=pages_per_win)
    pool = create_kv_pool(config, cache)
    tables = jnp.arange(B * pages_per_win, dtype=jnp.int32).reshape(
        B, pages_per_win)
    family = get_family(config)
    tokens = jnp.asarray(ids)

    def run(params, pool):
        active = jnp.ones(B, bool)

        def body(carry, t):
            pool, nll = carry
            logits, pool = family.decode_forward(
                params, config, pool, tokens[:, t],
                jnp.full(B, 1, jnp.int32) * t,
                jnp.full(B, 1, jnp.int32) * (t + 1),
                tables, active, interpret=interpret)
            lp = jax.nn.log_softmax(logits, axis=-1)
            tgt = tokens[:, t + 1]
            nll = nll - jnp.sum(jnp.take_along_axis(
                lp, tgt[:, None], axis=1))
            return (pool, nll), None

        (pool, nll), _ = jax.lax.scan(
            body, (pool, jnp.float32(0.0)), jnp.arange(window - 1))
        return nll

    nll = float(jax.jit(run, donate_argnums=(1,))(params, pool))
    return math.exp(nll / (B * (window - 1)))
