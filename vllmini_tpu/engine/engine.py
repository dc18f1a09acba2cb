"""LLMEngine: device-state owner + compiled step functions.

This is the execution half of the reference's Scheduler+BlockManager pair
(`/root/reference/vllmini/scheduler.py`, `block_manager.py`), restructured for XLA:

- ONE compiled decode function with a fixed slot-batch shape, run every engine
  tick (the reference launches a fresh 1-seq forward per token and allocates new
  CUDA tensors per step — `block_manager.py:56`, a recompile-per-token under XLA);
- one compiled prefill function per prompt-length bucket;
- the KV pool is donated through every step (in-place update, no pool copy);
- sampling runs inside the step (no host round-trip before sampling, unlike
  the reference's `.item()` sync at `scheduler.py:103`);
- swap-out/swap-in for preempted sequences actually works (the reference's is
  broken and unreachable, `block_manager.py:75-88`).
"""

from __future__ import annotations

import functools
import logging
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, SamplingParams
from ..memory.allocator import PageAllocator
from ..memory.kv_cache import KVPool, create_kv_pool
from ..models.registry import get_family
from ..utils.metrics import Metrics
from .sampling import sample_tokens
from .sequence import Sequence

logger = logging.getLogger("vllmini_tpu.engine")


def _default_interpret() -> bool:
    # Pallas compiles natively on TPU backends; anywhere else (CPU tests),
    # run kernels in interpreter mode.
    return jax.default_backend() not in ("tpu", "axon")


class SwappedKV:
    """Host-side copy of a preempted sequence's KV pages (+ scales)."""

    def __init__(self, arrays: Dict[str, np.ndarray], num_tokens: int):
        self.arrays = arrays
        self.num_tokens = num_tokens


class LLMEngine:
    def __init__(self, config: EngineConfig, params=None, *,
                 rng_seed: Optional[int] = None, interpret: Optional[bool] = None):
        self.config = config
        self.family = get_family(config.model)
        self.interpret = _default_interpret() if interpret is None else interpret
        self.metrics = Metrics()

        if not self.interpret:
            # Native Mosaic DMA constraints (see ops/paged_attention.py).
            tile = config.cache.sublane_tile
            if config.cache.page_size % tile != 0:
                raise ValueError(
                    f"page_size={config.cache.page_size} must be a multiple "
                    f"of {tile} for kv_dtype={config.cache.kv_dtype} on TPU")
            if config.cache.padded_head_dim(config.model.head_size) % 128:
                raise ValueError("pool head_dim must be 128-aligned on TPU; "
                                 "set CacheConfig.head_pad_to=128")

        if params is None:
            params = self.family.init_params(
                config.model, jax.random.PRNGKey(config.seed))
        self.params = params
        self.pool: KVPool = create_kv_pool(config.model, config.cache)
        self.allocator = PageAllocator(
            config.cache.num_pages, config.cache.page_size,
            config.cache.max_pages_per_seq)
        self.max_slots = config.scheduler.max_decode_slots
        self.pages_per_seq_max = config.cache.max_pages_per_seq

        self._base_key = jax.random.PRNGKey(
            config.seed if rng_seed is None else rng_seed)
        self._step_counter = 0
        self._swapped: Dict[int, SwappedKV] = {}

        # Bucket list covering up to max context.
        max_ctx = min(config.cache.max_context_len,
                      config.model.max_position_embeddings)
        buckets = sorted(b for b in config.scheduler.prefill_buckets
                         if b <= max_ctx)
        if not buckets or buckets[-1] < max_ctx:
            buckets.append(max_ctx)
        self.prefill_buckets = buckets

        self._decode_fn = jax.jit(
            self._decode_impl, donate_argnums=(1,),
            static_argnames=())
        self._prefill_fns: Dict[int, object] = {}

    # ------------------------------------------------------------------ device

    def _decode_impl(self, params, pool, token_ids, positions, seq_lens,
                     page_tables, active, rng, temps, top_ks, top_ps):
        logits, pool = self.family.decode_forward(
            params, self.config.model, pool, token_ids, positions, seq_lens,
            page_tables, active, interpret=self.interpret)
        toks = sample_tokens(logits, rng, temps, top_ks, top_ps)
        return toks, pool

    def _prefill_impl(self, params, pool, token_ids, seq_len, page_table,
                      rng, temp, top_k, top_p):
        logits, pool = self.family.prefill_forward(
            params, self.config.model, pool, token_ids, seq_len, page_table,
            interpret=self.interpret)
        tok = sample_tokens(logits[None, :], rng, temp[None], top_k[None],
                            top_p[None])[0]
        return tok, pool

    def _get_prefill_fn(self, bucket: int):
        fn = self._prefill_fns.get(bucket)
        if fn is None:
            fn = jax.jit(self._prefill_impl, donate_argnums=(1,))
            self._prefill_fns[bucket] = fn
        return fn

    def _next_rng(self) -> jax.Array:
        self._step_counter += 1
        return jax.random.fold_in(self._base_key, self._step_counter)

    # ----------------------------------------------------------------- prefill

    def bucket_for(self, length: int) -> int:
        for b in self.prefill_buckets:
            if length <= b:
                return b
        raise ValueError(
            f"prompt length {length} exceeds max context "
            f"{self.prefill_buckets[-1]}")

    def prefill(self, seq: Sequence) -> int:
        """Allocate pages, run the prompt, sample the first token.

        Caller must have checked `allocator.can_allocate`. Returns the token.
        """
        L = len(seq.prompt_ids)
        bucket = self.bucket_for(L)
        self.allocator.allocate(seq.seq_id, L)
        table = jnp.asarray(self.allocator.padded_table(seq.seq_id))
        padded = np.zeros(bucket, np.int32)
        padded[:L] = seq.prompt_ids
        s = seq.sampling
        tok, self.pool = self._get_prefill_fn(bucket)(
            self.params, self.pool, jnp.asarray(padded), jnp.int32(L), table,
            self._next_rng(), jnp.float32(0.0 if s.greedy else s.temperature),
            jnp.int32(s.top_k), jnp.float32(s.top_p))
        seq.tokens_in_kv = L
        seq.last_token = int(tok)
        self.metrics.counter("prefill_tokens", L)
        return seq.last_token

    # ------------------------------------------------------------------ decode

    def decode(self, seqs: List[Optional[Sequence]]) -> np.ndarray:
        """One batched decode step over the slot list (None = inactive slot).

        Each active sequence's `last_token` is fed at position `tokens_in_kv`;
        on return tokens_in_kv has advanced and `last_token` is the new sample.
        Caller must already have called `allocator.append_token` for each
        active sequence (page headroom for the incoming token).
        """
        B = self.max_slots
        assert len(seqs) == B
        token_ids = np.zeros(B, np.int32)
        positions = np.zeros(B, np.int32)
        seq_lens = np.zeros(B, np.int32)
        tables = np.full((B, self.pages_per_seq_max),
                         self.allocator.num_pages, np.int32)
        active = np.zeros(B, bool)
        temps = np.zeros(B, np.float32)
        top_ks = np.zeros(B, np.int32)
        top_ps = np.ones(B, np.float32)

        for i, seq in enumerate(seqs):
            if seq is None:
                continue
            active[i] = True
            token_ids[i] = seq.last_token
            positions[i] = seq.tokens_in_kv
            seq_lens[i] = seq.tokens_in_kv + 1
            tables[i] = self.allocator.padded_table(seq.seq_id)
            s = seq.sampling
            temps[i] = 0.0 if s.greedy else s.temperature
            top_ks[i] = s.top_k
            top_ps[i] = s.top_p

        toks, self.pool = self._decode_fn(
            self.params, self.pool, jnp.asarray(token_ids),
            jnp.asarray(positions), jnp.asarray(seq_lens),
            jnp.asarray(tables), jnp.asarray(active), self._next_rng(),
            jnp.asarray(temps), jnp.asarray(top_ks), jnp.asarray(top_ps))
        toks = np.asarray(jax.device_get(toks))

        for i, seq in enumerate(seqs):
            if seq is None:
                continue
            seq.output_ids.append(seq.last_token)
            seq.tokens_in_kv += 1
            seq.last_token = int(toks[i])
        self.metrics.counter("decode_steps", 1)
        self.metrics.counter("decode_tokens", int(active.sum()))
        return toks

    # ----------------------------------------------------------- free and swap

    def free_sequence(self, seq: Sequence) -> None:
        if self.allocator.has_seq(seq.seq_id):
            self.allocator.free(seq.seq_id)
        self._swapped.pop(seq.seq_id, None)

    def swap_out(self, seq: Sequence) -> None:
        """Copy the sequence's KV pages to host RAM and release them.

        TPU analog of `swap_blocks` GPU->CPU (`cache_kernels.cu:24-63`) plus the
        bookkeeping `swap_to_cpu` (`block_manager.py:70-73`).
        """
        pages = self.allocator.seq_pages(seq.seq_id)
        idx = jnp.asarray(pages, jnp.int32)
        arrays = {
            "k": np.asarray(jax.device_get(self.pool.k_pages[:, :, idx])),
            "v": np.asarray(jax.device_get(self.pool.v_pages[:, :, idx])),
        }
        if self.pool.quantized:
            arrays["ks"] = np.asarray(jax.device_get(
                self.pool.k_scales[:, :, idx]))
            arrays["vs"] = np.asarray(jax.device_get(
                self.pool.v_scales[:, :, idx]))
        self._swapped[seq.seq_id] = SwappedKV(arrays, seq.tokens_in_kv)
        self.allocator.release_for_swap(seq.seq_id)
        self.metrics.counter("swap_outs", 1)

    def can_swap_in(self, seq: Sequence) -> bool:
        return self.allocator.can_allocate(seq.tokens_in_kv)

    def swap_in(self, seq: Sequence) -> None:
        """Re-allocate pages and restore KV contents from host RAM."""
        sw = self._swapped.pop(seq.seq_id)
        pages = self.allocator.allocate_for_swap_in(seq.seq_id, sw.num_tokens)
        idx = jnp.asarray(pages, jnp.int32)
        import dataclasses as _dc
        pool = self.pool
        pool = _dc.replace(
            pool,
            k_pages=pool.k_pages.at[:, :, idx].set(
                jnp.asarray(sw.arrays["k"], pool.k_pages.dtype)),
            v_pages=pool.v_pages.at[:, :, idx].set(
                jnp.asarray(sw.arrays["v"], pool.v_pages.dtype)),
        )
        if pool.quantized:
            pool = _dc.replace(
                pool,
                k_scales=pool.k_scales.at[:, :, idx].set(
                    jnp.asarray(sw.arrays["ks"])),
                v_scales=pool.v_scales.at[:, :, idx].set(
                    jnp.asarray(sw.arrays["vs"])),
            )
        self.pool = pool
        self.metrics.counter("swap_ins", 1)
