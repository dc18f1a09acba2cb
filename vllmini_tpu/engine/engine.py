"""LLMEngine: device-state owner + compiled step functions.

This is the execution half of the reference's Scheduler+BlockManager pair
(`/root/reference/vllmini/scheduler.py`, `block_manager.py`), restructured for XLA
and for high-latency host<->device links:

- ALL decode state (current token, lengths, sampling params, output buffer,
  finished flags) lives ON DEVICE in a donated pytree; the host never touches it
  token-by-token. The reference does a host round trip per token
  (`scheduler.py:103` `.item()`); through this environment's TPU tunnel a single
  sync costs ~25 ms, so per-token host logic caps throughput at ~40 steps/s
  regardless of model size.
- Decode runs in jitted CHUNKS of K steps (`lax.scan` over the full forward +
  sampling + state commit); the host syncs once per chunk: reserve KV page
  headroom, dispatch, fetch a tiny state summary.
- Chunks PIPELINE: only the multi-MB pool is donated; the small decode-state
  pytree is copied by XLA each chunk (~20 KB), so every chunk's post-state
  remains a readable snapshot. The scheduler dispatches chunk k+1 before
  fetching chunk k's summary, hiding the (tunneled, ~25 ms) host<->device
  round trip behind device compute; `decode_chunk` starts an async
  device->host copy of the snapshot at dispatch so the lagged fetch finds the
  bytes already on the host.
- Prefill + first-token sampling + slot insertion are one jitted call — no
  readback on admission.
- The KV pool and decode state are donated through every call (in-place, no
  copies of the multi-MB pool).
- swap-out/swap-in for preempted sequences actually works (the reference's is
  broken and unreachable, `block_manager.py:75-88`).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..config import EngineConfig
from ..memory.allocator import make_allocator
from ..memory.kv_cache import KVPool, create_kv_pool
from ..models.registry import get_family
from ..utils.metrics import Metrics
from .sampling import sample_tokens, sample_tokens_lp
from .sequence import Sequence

logger = logging.getLogger("vllmini_tpu.engine")

MAX_STOP_TOKENS = 4


def _default_interpret() -> bool:
    # Pallas compiles natively on TPU backends; anywhere else (CPU tests),
    # run kernels in interpreter mode.
    return jax.default_backend() not in ("tpu",)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DecodeState:
    """Per-slot decode state, resident on device, donated through every chunk."""

    last_token: jax.Array    # [B] i32 — sampled, KV not yet written
    tokens_in_kv: jax.Array  # [B] i32 — committed KV length
    active: jax.Array        # [B] bool — slot occupied and not finished
    out_buf: jax.Array       # [B, CAP] i32 — generated tokens
    out_lp: jax.Array        # [B, CAP] f32 — their log-probs (OpenAI logprobs)
    out_count: jax.Array     # [B] i32
    max_new: jax.Array       # [B] i32 — generation budget
    stop_tokens: jax.Array   # [B, MAX_STOP_TOKENS] i32 (-1 = unused)
    total_cap: jax.Array     # [B] i32 — hard context cap per slot
    temps: jax.Array         # [B] f32
    top_ks: jax.Array        # [B] i32
    top_ps: jax.Array        # [B] f32
    seeds: jax.Array         # [B] u32 — per-request RNG stream seed
    # Committed token history (prompt + generated), device-resident so the
    # speculative n-gram proposer never syncs with the host. Only the first
    # tokens_in_kv entries are meaningful.
    token_buf: jax.Array     # [B, CAP] i32
    spec_emitted: jax.Array  # [B] i32 — tokens emitted by spec steps
    spec_steps: jax.Array    # [B] i32 — spec verify steps taken


def make_decode_state(batch: int, out_cap: int) -> DecodeState:
    # Each field gets its OWN buffer (no shared aliasing surprises).
    def z():
        return jnp.zeros(batch, jnp.int32)

    return DecodeState(
        last_token=z(),
        tokens_in_kv=z(),
        active=jnp.zeros(batch, bool),
        out_buf=jnp.zeros((batch, out_cap), jnp.int32),
        out_lp=jnp.zeros((batch, out_cap), jnp.float32),
        out_count=z(),
        max_new=z(),
        stop_tokens=jnp.full((batch, MAX_STOP_TOKENS), -1, jnp.int32),
        total_cap=z(),
        temps=jnp.zeros(batch, jnp.float32),
        top_ks=z(),
        top_ps=jnp.ones(batch, jnp.float32),
        seeds=jnp.zeros(batch, jnp.uint32),
        token_buf=jnp.zeros((batch, out_cap), jnp.int32),
        spec_emitted=z(),
        spec_steps=z(),
    )


def _propose_ngram(token_buf: jax.Array, T: jax.Array, last_token: jax.Array,
                   *, n: int, S: int) -> jax.Array:
    """Prompt-lookup drafting, fully on device: for each row, find the most
    recent earlier occurrence of the current n-gram suffix (the last n-1
    committed tokens + the pending `last_token`) in the row's own history
    and propose the S tokens that followed it.

    Draft QUALITY is free to be garbage — acceptance compares each draft
    against the token the verifier actually samples, so a bad draft only
    costs the (batched) rejected verify work, never correctness. Returns
    [B, S] token ids (0-filled when no match)."""
    B, cap = token_buf.shape
    idx = jnp.arange(cap, dtype=jnp.int32)[None]            # [1, cap]
    m = jnp.ones((B, cap), bool)
    for k in range(n):
        if k == 0:
            s_k = last_token                                # suffix end
        else:
            s_k = token_buf[jnp.arange(B), jnp.clip(T - k, 0, cap - 1)]
        if k:
            shifted = jnp.pad(token_buf, ((0, 0), (k, 0)))[:, :cap]
        else:
            shifted = token_buf
        m &= shifted == s_k[:, None]
    valid = (idx >= n - 1) & (idx <= T[:, None] - 1) & (T[:, None] >= n)
    # Prefer the most recent match whose FULL S-token continuation is
    # committed history: on a self-similar stream the most recent match sits
    # at T-1 and its continuation is the unwritten region (all zeros — the
    # exact case drafting exists for would propose nothing). Fall back to
    # any match (partial continuation, tail masked to 0).
    p_full = jnp.max(jnp.where(m & valid & (idx <= T[:, None] - 1 - S),
                               idx, -1), axis=1)            # [B]
    p_any = jnp.max(jnp.where(m & valid, idx, -1), axis=1)  # [B]
    p = jnp.where(p_full >= 0, p_full, p_any)
    gather = p[:, None] + 1 + jnp.arange(S, dtype=jnp.int32)[None]
    drafts = jnp.take_along_axis(token_buf, jnp.clip(gather, 0, cap - 1),
                                 axis=1)
    committed = gather <= T[:, None] - 1
    return jnp.where((p[:, None] >= 0) & committed, drafts, 0)


class SwappedKV:
    """Host-side copy of a preempted sequence's KV pages (+ scales).

    `start_page` is the first saved LOGICAL page (windowed sequences only
    save their live ring tail; earlier pages are dead below the window)."""

    def __init__(self, arrays: Dict[str, np.ndarray], num_tokens: int,
                 start_page: int = 0):
        self.arrays = arrays
        self.num_tokens = num_tokens
        self.start_page = start_page


@dataclasses.dataclass
class StateSummary:
    """Host snapshot of the device state after a chunk (one fetch)."""

    tokens_in_kv: np.ndarray
    active: np.ndarray
    out_count: np.ndarray
    out_buf: np.ndarray
    out_lp: np.ndarray
    last_token: np.ndarray


class LLMEngine:
    def __init__(self, config: EngineConfig, params=None, *,
                 rng_seed: Optional[int] = None,
                 interpret: Optional[bool] = None):
        self.config = config
        self.family = get_family(config.model)
        self.interpret = _default_interpret() if interpret is None else interpret
        self.metrics = Metrics()

        if not self.interpret:
            # Native Mosaic DMA constraints (see ops/paged_attention.py):
            # pages are DMA'd whole, so their (page_size, row_width) trailing
            # dims must be tile-aligned; row_width is aligned by construction.
            tile = config.cache.sublane_tile
            if config.cache.page_size % tile != 0:
                raise ValueError(
                    f"page_size={config.cache.page_size} must be a multiple "
                    f"of {tile} for kv_dtype={config.cache.kv_dtype} on TPU")

        if params is None:
            params = self.family.init_params(
                config.model, jax.random.PRNGKey(config.seed))
        if config.fuse_projections:
            # One QKV / gate-up matmul per block instead of 3 / 2 — fewer
            # HBM weight streams and (quantized) kernel launches per step.
            from ..models.fuse import fuse_params
            params = fuse_params(params, config.model)

        # --- parallelism over a (dp, tp) mesh. TP: weights head-/channel-
        # sharded, KV pool head-lane-sharded, psum-combined row projections —
        # the Pallas kernels run unmodified on each chip's local heads (zero
        # attention-time communication). DP: decode slots, page tables, and
        # the page pool shard over the "data" axis — each replica is an
        # independent pool addressed by LOCAL page indices with its own
        # host-side allocator; a sequence lives entirely in one replica
        # (its slot determines which).
        self.tp = config.parallel.tensor_parallel
        self.dp = config.parallel.data_parallel
        if config.scheduler.max_decode_slots % self.dp != 0:
            raise ValueError("max_decode_slots must divide data_parallel")
        self.local_slots = config.scheduler.max_decode_slots // self.dp
        if self.tp > 1 or self.dp > 1:
            from ..parallel.mesh import make_mesh
            from ..parallel.tp import local_model_config, shard_params
            self.mesh = make_mesh(self.dp, self.tp)
            self.local_model = local_model_config(config.model, self.tp)
            params = shard_params(params, config.model, self.mesh)
        else:
            self.mesh = None
            self.local_model = config.model
        self.params = params
        self.pool: KVPool = create_kv_pool(config.model, config.cache,
                                           shards=self.tp)
        if self.mesh is not None:
            from ..parallel.tp import shard_pool
            if self.dp > 1:  # one independent pool per data replica
                self.pool = dataclasses.replace(
                    self.pool,
                    kv_pages=[jnp.tile(x, (self.dp, 1, 1, 1))
                              for x in self.pool.kv_pages],
                    kv_scales=(None if self.pool.kv_scales is None else
                               [jnp.tile(x, (self.dp, 1, 1, 1))
                                for x in self.pool.kv_scales]))
            self.pool = shard_pool(self.pool, self.mesh)
        # Prefill shape buckets (needed below for the windowed ring size).
        # Prompts longer than the largest bucket are admitted in page-aligned
        # CHUNKS (each chunk attends over the pool-resident prefix), so no
        # max_context-sized program is ever compiled and prompt admission is
        # bounded only by pool capacity.
        ps = config.cache.page_size
        self.max_context = min(config.cache.max_context_len,
                               config.model.max_position_embeddings)
        buckets = sorted(b for b in config.scheduler.prefill_buckets
                         if b <= self.max_context)
        if not buckets:
            buckets = [min(256, self.max_context)]
        self.prefill_buckets = buckets
        self.prefill_chunk = max(ps, buckets[-1] // ps * ps)
        # Burst admission (batched multi-prompt prefill): row-count buckets
        # are powers of two up to SchedulerConfig.prefill_burst so a burst of
        # any width compiles at most log2(burst_max) shapes per length
        # bucket. Disabled (1) when the family has no batched forward.
        bm = max(1, config.scheduler.prefill_burst)
        if self.family.prefill_batch_forward is None:
            bm = 1
        self.burst_max = bm
        self.burst_buckets = []
        b = 2
        while b < bm:
            self.burst_buckets.append(b)
            b *= 2
        if bm >= 2:
            self.burst_buckets.append(bm)

        # Speculative decoding (n-gram drafting, SchedulerConfig docs): each
        # chunk step verifies 1 + speculative_tokens positions in one weight
        # stream; output is bit-identical to plain decoding.
        self.spec_tokens = config.scheduler.speculative_tokens
        self.spec_ngram = max(1, config.scheduler.speculative_ngram)
        if self.spec_tokens > 0 and self.family.decode_verify_forward is None:
            raise ValueError(
                f"family {self.family.name} has no decode_verify_forward; "
                "set speculative_tokens=0")
        if self.spec_tokens > config.cache.page_size:
            # write_kv_spec patches at most TWO pages per sequence, which
            # holds iff S+1 consecutive positions span <= 2 pages.
            raise ValueError(
                f"speculative_tokens ({self.spec_tokens}) must be <= "
                f"page_size ({config.cache.page_size})")

        # Sliding-window models get a RING allocator: pages fully below the
        # window are recycled, so steady-state usage per sequence is bounded
        # however long the generation. The ring must be wide enough that no
        # WRITE ever lands on a page still backing in-window positions; for
        # one decoded token that is ceil(window/page_size)+1, but a chunked
        # prefill writes a whole chunk (chunk_pages pages) before gathering
        # the pool-resident prefix, so the ring is sized
        # ceil(window/ps) + chunk_pages (ADVICE r2: the +1 ring aliased
        # chunk writes onto live prefix pages). A speculative step writes
        # up to spec_tokens positions past the committed length — widen the
        # ring by the extra page that can touch.
        window = config.model.sliding_window
        spec_ring_extra = (-(-self.spec_tokens // ps)
                           if self.spec_tokens else 0)
        self.window_pages = (
            -(-window // config.cache.page_size)
            + max(1 + spec_ring_extra, self.prefill_chunk // ps)
            if window else None)
        # Run-granular page grants (one attention compute block per DMA):
        # auto-on for ample pools; off for windowed rings and tight pools
        # (earlier reservation would raise preemption pressure).
        run_pages = config.cache.alloc_run_pages
        if run_pages is None:
            from ..ops.paged_attention import gather_run_pages

            ample = (config.cache.num_pages * self.dp
                     >= (config.scheduler.max_decode_slots
                         * config.cache.max_pages_per_seq) // 2)
            run_pages = (gather_run_pages(config.cache.page_size,
                                          config.cache.max_pages_per_seq)
                         if ample and self.window_pages is None else 1)
        self.allocators = [
            make_allocator(config.cache.num_pages, config.cache.page_size,
                           config.cache.max_pages_per_seq,
                           window_pages=self.window_pages,
                           run_pages=run_pages)
            for _ in range(self.dp)]
        self.allocator = self.allocators[0]  # dp==1 fast path / back-compat
        # Automatic prefix caching (one cache per data replica's pool).
        # Windowed models are excluded: the ring allocator re-aliases a
        # sequence's early pages, so a published prefix page may later be
        # overwritten by the ring while the cache still maps its hash to it
        # (ADVICE r2 high #2) — silent wrong-KV adoption.
        self.prefix_caches = None
        if config.cache.enable_prefix_cache:
            if self.window_pages is not None:
                logger.warning(
                    "prefix cache disabled: sliding-window ring allocator "
                    "re-aliases pages, cached prefixes would go stale")
            else:
                from ..memory.prefix_cache import PrefixCache
                self.prefix_caches = [PrefixCache(a) for a in self.allocators]
        # seq_id -> data replica index (assigned at prefill/swap-in).
        self.seq_replica: Dict[int, int] = {}
        self.max_slots = config.scheduler.max_decode_slots
        self.pages_per_seq_max = config.cache.max_pages_per_seq
        self.chunk_steps = config.scheduler.decode_chunk_steps

        # Decode KV partitioning (paged_attention_v2 analog): split each
        # sequence over P grid programs + LSE merge when the batch alone
        # can't keep the gather pipeline busy on long contexts. Auto rule:
        # bring batch x P up to ~8 programs — only for >=8k contexts.
        # Measured on a v5e (docs/BENCH_r05.md, llama3-8b int4, batch 4,
        # ctx~4k): P=2 was a -2% LOSS vs P=1 — at 4k the weight stream
        # still dominates the per-seq KV read, so the extra grid programs
        # cost more than their gather overlap buys. Explicit
        # scheduler.kv_partitions > 1 always wins over the auto rule.
        kp = config.scheduler.kv_partitions
        if kp == 0:
            if self.max_context >= 8192 and self.local_slots < 8:
                kp = max(1, 8 // self.local_slots)
            else:
                kp = 1
        self.kv_partitions = kp

        self.state = make_decode_state(self.max_slots, self.max_context)
        # Host mirror of device page tables (re-uploaded when changed).
        self._tables_host = np.full(
            (self.max_slots, self.pages_per_seq_max),
            config.cache.num_pages, np.int32)
        self._tables_dirty = True
        self._tables_dev = None

        self._swapped: Dict[int, SwappedKV] = {}
        # Multi-host: when set, every device-mutating exec_* call appends
        # (op_name, kwargs-of-arrays) here; the primary broadcasts the log and
        # workers replay it via apply_commands (see parallel/multihost.py).
        self.command_sink: Optional[List] = None
        self._seed_base = config.seed if rng_seed is None else rng_seed

        # Donate ONLY the pool: the small DecodeState must stay readable as a
        # per-chunk snapshot after later chunks are dispatched (pipelining).
        # `slot` is a traced scalar: one compile per prompt bucket, not per
        # bucket x slot (which made first-token latency scale with slot count).
        chunk_impl = (self._chunk_spec_impl if self.spec_tokens
                      else self._chunk_impl)
        if self.mesh is None:
            self._chunk_fn = jax.jit(chunk_impl, donate_argnums=(1,),
                                     static_argnames=("steps", "want_lp", "all_greedy"))
            self._prefill_fn = jax.jit(self._prefill_impl, donate_argnums=(1,),
                                       static_argnames=("prefix_tokens",))
            self._prefill_chunk_fn = jax.jit(
                self._prefill_chunk_impl, donate_argnums=(1,),
                static_argnames=("prefix_tokens",))
            self._prefill_batch_fn = jax.jit(self._prefill_batch_impl,
                                             donate_argnums=(1,))
        else:
            from ..parallel.tp import param_specs, pool_pspec

            from ..parallel.mesh import DATA_AXIS

            pspecs = param_specs(self.params)
            poolspecs = pool_pspec(config.model.num_layers,
                                   self.pool.quantized,
                                   num_kv_heads=self.pool.num_kv_heads,
                                   head_dim=self.pool.head_dim)
            # Decode state shards its slot dimension over the data axis.
            stspecs = jax.tree.map(
                lambda x: P(DATA_AXIS) if x.ndim == 1 else P(DATA_AXIS, None),
                self.state)
            tspec = P(DATA_AXIS, None)  # page tables: slots on data
            bspec = P(DATA_AXIS)        # step budget

            def chunk_sharded(params, pool, state, tables, budget, *,
                              steps: int, want_lp: bool = True,
                              all_greedy: bool = False):
                inner = jax.shard_map(
                    lambda *a: chunk_impl(*a, steps=steps, want_lp=want_lp,
                                          all_greedy=all_greedy),
                    mesh=self.mesh,
                    in_specs=(pspecs, poolspecs, stspecs, tspec, bspec),
                    out_specs=(poolspecs, stspecs),
                    check_vma=False)
                return inner(params, pool, state, tables, budget)

            local_slots = self.local_slots

            def prefill_sharded(params, pool, state, *rest,
                                prefix_tokens: int = 0):
                def inner_fn(params, pool, state, *rest):
                    # Global slot ids -> this replica's local ids; slots
                    # owned elsewhere become -1 (masked inserts), and the
                    # non-owner's table row is all-sentinel so its pool
                    # writes land on ITS trash page.
                    base = jax.lax.axis_index(DATA_AXIS) * local_slots
                    return self._prefill_impl(params, pool, state, *rest,
                                              slot_base=base,
                                              prefix_tokens=prefix_tokens)
                # operand 2 of *rest is the per-replica table row [dp, pps].
                rspecs = (P(), P(), tspec) + (P(),) * 9
                inner = jax.shard_map(
                    inner_fn,
                    mesh=self.mesh,
                    in_specs=(pspecs, poolspecs, stspecs) + rspecs,
                    out_specs=(poolspecs, stspecs),
                    check_vma=False)
                return inner(params, pool, state, *rest)

            def prefill_chunk_sharded(params, pool, *rest,
                                      prefix_tokens: int = 0):
                inner = jax.shard_map(
                    lambda *a: self._prefill_chunk_impl(
                        *a, prefix_tokens=prefix_tokens),
                    mesh=self.mesh,
                    in_specs=(pspecs, poolspecs, P(), P(), tspec),
                    out_specs=poolspecs,
                    check_vma=False)
                return inner(params, pool, *rest)

            def prefill_batch_sharded(params, pool, state, *rest):
                def inner_fn(params, pool, state, *rest):
                    base = jax.lax.axis_index(DATA_AXIS) * local_slots
                    return self._prefill_batch_impl(params, pool, state,
                                                    *rest, slot_base=base)
                # operand 2 of *rest is the per-replica table block
                # [dp, B, pps]; everything else is replicated.
                rspecs = (P(), P(), P(DATA_AXIS, None, None)) + (P(),) * 9
                inner = jax.shard_map(
                    inner_fn,
                    mesh=self.mesh,
                    in_specs=(pspecs, poolspecs, stspecs) + rspecs,
                    out_specs=(poolspecs, stspecs),
                    check_vma=False)
                return inner(params, pool, state, *rest)

            self._chunk_fn = jax.jit(chunk_sharded, donate_argnums=(1,),
                                     static_argnames=("steps", "want_lp", "all_greedy"))
            self._prefill_fn = jax.jit(prefill_sharded, donate_argnums=(1,),
                                       static_argnames=("prefix_tokens",))
            self._prefill_chunk_fn = jax.jit(
                prefill_chunk_sharded, donate_argnums=(1,),
                static_argnames=("prefix_tokens",))
            self._prefill_batch_fn = jax.jit(prefill_batch_sharded,
                                             donate_argnums=(1,))

    # ------------------------------------------------------------------ device

    @property
    def _tp_axis(self) -> Optional[str]:
        if self.mesh is None:
            return None
        from ..parallel.mesh import MODEL_AXIS
        return MODEL_AXIS

    # ------------------------------------------------- data-parallel routing

    def replica_of_slot(self, slot: int) -> int:
        return slot // self.local_slots

    def alloc_of_slot(self, slot: int):
        return self.allocators[self.replica_of_slot(slot)]

    def alloc_of_seq(self, seq_id: int):
        return self.allocators[self.seq_replica.get(seq_id, 0)]

    @property
    def num_free_pages(self) -> int:
        return sum(a.num_free_pages for a in self.allocators)

    def ensure_pages(self, replica: int, num_tokens: int,
                     extra_pages: int = 0) -> bool:
        """Can `replica` hold `num_tokens` (+extra pages)? Evicts prefix-
        cache entries (LRU, cache's reference only) to make room first."""
        alloc = self.allocators[replica]
        need = alloc.phys_pages_needed(num_tokens) + extra_pages
        if self.prefix_caches is not None and alloc.num_free_pages < need:
            self.prefix_caches[replica].evict_for(need)
        return alloc.num_free_pages >= need

    def try_evict_prefix(self, replica: int, pages: int = 1) -> bool:
        """Give back prefix-cache pages under decode-time pool pressure;
        True if anything was freed."""
        if self.prefix_caches is None:
            return False
        before = self.allocators[replica].num_free_pages
        self.prefix_caches[replica].evict_for(before + pages)
        return self.allocators[replica].num_free_pages > before

    def _globalize_pages(self, pages, replica: int):
        """Replica-local page indices -> indices into the dp-stacked global
        pool arrays (each replica owns num_pages+1 rows incl. its trash)."""
        stride = self.config.cache.num_pages + 1
        return np.asarray(pages, np.int64) + replica * stride

    def _forward_decode(self, params, pool, state: DecodeState, page_tables):
        positions = state.tokens_in_kv
        seq_lens = jnp.where(state.active, state.tokens_in_kv + 1, 0)
        return self.family.decode_forward(
            params, self.local_model, pool, state.last_token, positions,
            seq_lens, page_tables, state.active, interpret=self.interpret,
            tp_axis=self._tp_axis, kv_partitions=self.kv_partitions)

    def _chunk_impl(self, params, pool, state: DecodeState, page_tables,
                    step_budget, *, steps: int, want_lp: bool = True,
                    all_greedy: bool = False):
        """Run up to `steps` decode iterations fully on device.

        `want_lp` (static) gates the log-prob capture: when no running
        request asked for logprobs the log-softmax normalization — an extra
        full [B, vocab] pass per step — is compiled out and out_lp receives
        zeros (never read in that case). `all_greedy` (static) compiles the
        sampler's candidate machinery out when every running request is
        greedy (see sampling.sample_tokens) — bit-identical tokens."""

        def body(carry, _):
            pool, st, budget = carry
            can_step = st.active & (budget > 0)
            st_masked = dataclasses.replace(st, active=can_step)
            logits, pool = self._forward_decode(params, pool, st_masked,
                                                page_tables)
            # Per-slot randomness is a pure function of (seed, position):
            # reproducible across batch composition and recompute.
            if want_lp:
                tok, lp = sample_tokens_lp(logits, st.seeds,
                                           st.tokens_in_kv, st.temps,
                                           st.top_ks, st.top_ps,
                                           all_greedy=all_greedy)
            else:
                tok = sample_tokens(logits, st.seeds, st.tokens_in_kv,
                                    st.temps, st.top_ks, st.top_ps,
                                    all_greedy=all_greedy)
                lp = jnp.zeros(tok.shape, jnp.float32)

            # Commit: the fed token's KV is now written.
            tokens_in_kv = st.tokens_in_kv + can_step.astype(jnp.int32)
            # Stop conditions evaluated on the NEW sample.
            is_stop = jnp.any(tok[:, None] == st.stop_tokens, axis=1)
            # Store the new sample unless stopping or budget exhausted.
            will_store = can_step & ~is_stop
            idx = jnp.minimum(st.out_count, st.out_buf.shape[1] - 1)
            ar = jnp.arange(st.out_buf.shape[0])
            out_buf = st.out_buf.at[ar, idx].set(
                jnp.where(will_store, tok, st.out_buf[ar, idx]))
            out_lp = st.out_lp.at[ar, idx].set(
                jnp.where(will_store, lp, st.out_lp[ar, idx]))
            out_count = st.out_count + will_store.astype(jnp.int32)

            hit_max = out_count >= st.max_new
            hit_cap = (tokens_in_kv + 1) > st.total_cap
            finished = can_step & (is_stop | hit_max | hit_cap)
            active = st.active & ~finished

            st = dataclasses.replace(
                st, last_token=jnp.where(can_step, tok, st.last_token),
                tokens_in_kv=tokens_in_kv, active=active,
                out_buf=out_buf, out_lp=out_lp, out_count=out_count)
            budget = budget - can_step.astype(jnp.int32)
            return (pool, st, budget), None

        (pool, state, _), _ = jax.lax.scan(
            body, (pool, state, step_budget), None, length=steps)
        return pool, state

    def _chunk_spec_impl(self, params, pool, state: DecodeState, page_tables,
                         step_budget, *, steps: int, want_lp: bool = True,
                         all_greedy: bool = False):
        """Speculative-decoding chunk: each iteration drafts S tokens per
        slot by n-gram lookup over the slot's own (device-resident) token
        history, verifies fed-token + drafts in ONE weight stream, and
        commits the accepted prefix plus the bonus sample. Bit-identical to
        `_chunk_impl`'s output for greedy AND seeded sampling: position i's
        sample uses the same (seed, position) fold, and a draft is accepted
        only when it EQUALS that sample — so the committed stream is exactly
        the serial one, just produced up to S+1 tokens per weight stream.
        Reference has no analog; vLLM ships this as ngram/prompt-lookup
        speculative decoding."""
        S, n = self.spec_tokens, self.spec_ngram
        S1 = S + 1

        def body(carry, _):
            pool, st, budget = carry
            can_step = st.active & (budget > 0)
            B = st.last_token.shape[0]
            ar = jnp.arange(B)
            T = st.tokens_in_kv
            drafts = _propose_ngram(st.token_buf, T, st.last_token,
                                    n=n, S=S)                    # [B, S]
            fed = jnp.concatenate([st.last_token[:, None], drafts],
                                  axis=1)                        # [B, S1]
            positions = T[:, None] + jnp.arange(S1, dtype=jnp.int32)
            logits, pool = self.family.decode_verify_forward(
                params, self.local_model, pool, fed, positions, page_tables,
                can_step, interpret=self.interpret, tp_axis=self._tp_axis)
            V = logits.shape[-1]
            if want_lp:
                g, glp = sample_tokens_lp(
                    logits.reshape(B * S1, V), jnp.repeat(st.seeds, S1),
                    positions.reshape(-1), jnp.repeat(st.temps, S1),
                    jnp.repeat(st.top_ks, S1),
                    jnp.repeat(st.top_ps, S1), all_greedy=all_greedy)
            else:
                g = sample_tokens(
                    logits.reshape(B * S1, V), jnp.repeat(st.seeds, S1),
                    positions.reshape(-1), jnp.repeat(st.temps, S1),
                    jnp.repeat(st.top_ks, S1),
                    jnp.repeat(st.top_ps, S1), all_greedy=all_greedy)
                glp = jnp.zeros(g.shape, jnp.float32)
            g, glp = g.reshape(B, S1), glp.reshape(B, S1)

            steps_allowed = jnp.minimum(budget, S1)
            out_buf, token_buf = st.out_buf, st.token_buf
            out_lp = st.out_lp
            out_count, tokens_in_kv = st.out_count, st.tokens_in_kv
            last_token = st.last_token
            finished_any = jnp.zeros(B, bool)
            emitted_total = jnp.zeros(B, jnp.int32)
            cont = can_step
            for i in range(S1):
                emit = cont & (i < steps_allowed)
                gi = g[:, i]
                is_stop = jnp.any(gi[:, None] == st.stop_tokens, axis=1)
                store = emit & ~is_stop
                oidx = jnp.minimum(out_count, out_buf.shape[1] - 1)
                out_buf = out_buf.at[ar, oidx].set(
                    jnp.where(store, gi, out_buf[ar, oidx]))
                out_lp = out_lp.at[ar, oidx].set(
                    jnp.where(store, glp[:, i], out_lp[ar, oidx]))
                out_count = out_count + store.astype(jnp.int32)
                # Fed token i is committed at position T+i.
                tidx = jnp.clip(T + i, 0, token_buf.shape[1] - 1)
                token_buf = token_buf.at[ar, tidx].set(
                    jnp.where(emit, fed[:, i], token_buf[ar, tidx]))
                tokens_in_kv = tokens_in_kv + emit.astype(jnp.int32)
                last_token = jnp.where(emit, gi, last_token)
                hit_max = out_count >= st.max_new
                hit_cap = (tokens_in_kv + 1) > st.total_cap
                fin = emit & (is_stop | hit_max | hit_cap)
                finished_any |= fin
                emitted_total = emitted_total + emit.astype(jnp.int32)
                if i + 1 < S1:
                    cont = emit & ~fin & (fed[:, i + 1] == gi)

            st = dataclasses.replace(
                st, last_token=last_token, tokens_in_kv=tokens_in_kv,
                active=st.active & ~finished_any, out_buf=out_buf,
                out_lp=out_lp, out_count=out_count, token_buf=token_buf,
                spec_emitted=st.spec_emitted + emitted_total,
                spec_steps=st.spec_steps + can_step.astype(jnp.int32))
            return pool, st, budget - emitted_total

        # while_loop, not scan: a verify step can emit up to S+1 tokens, so
        # the chunk's token budget may be spent in far fewer iterations —
        # once nothing can step, further iterations would still stream all
        # weights just to mask their effects.
        def cond(carry):
            _, st, budget = carry
            return jnp.any(st.active & (budget > 0))

        pool, state, _ = jax.lax.while_loop(
            cond, lambda c: body(c, None), (pool, state, step_budget))
        return pool, state

    def _prefill_impl(self, params, pool, state: DecodeState, token_ids,
                      seq_len, page_table, seeds, temp, top_k, top_p,
                      max_new, stop_tokens, total_cap, slots, all_tokens,
                      slot_base=0, prefix_tokens: int = 0):
        """Run the prompt once; insert into `slots` (F of them — slot 0 is
        the parent, the rest are COW forks for n-best sampling), each with
        its own first token sampled from the SHARED prefill logits under its
        own seed. Under data parallelism `slot_base` is this replica's first
        global slot; slots outside [base, base+local) are masked out (and
        the replica's table row is all-sentinel, so its KV writes go to its
        trash page)."""
        F = slots.shape[0]
        if page_table.ndim == 2:   # [1, pps] per-replica row under shard_map
            page_table = page_table[0]
        logits, pool = self.family.prefill_forward(
            params, self.local_model, pool, token_ids, seq_len, page_table,
            start_pos=prefix_tokens, interpret=self.interpret,
            tp_axis=self._tp_axis)
        toks, lps = sample_tokens_lp(
            jnp.broadcast_to(logits, (F,) + logits.shape), seeds,
            jnp.full((F,), prefix_tokens + seq_len, jnp.int32),
            jnp.full((F,), temp, jnp.float32),
            jnp.full((F,), top_k, jnp.int32),
            jnp.full((F,), top_p, jnp.float32))
        B_local = state.last_token.shape[0]
        for i in range(F):
            tok, tok_lp = toks[i], lps[i]
            local = slots[i] - slot_base
            slot = jnp.clip(local, 0, B_local - 1)
            valid = (slots[i] >= 0) & (local >= 0) & (local < B_local)

            def upd(arr, val, slot=slot, valid=valid):
                return arr.at[slot].set(jnp.where(valid, val, arr[slot]))

            is_stop = jnp.any(tok == stop_tokens)
            store = ~is_stop & (max_new >= 1)
            state = dataclasses.replace(
                state,
                last_token=upd(state.last_token, tok),
                tokens_in_kv=upd(state.tokens_in_kv,
                                 prefix_tokens + seq_len),
                active=upd(state.active, ~is_stop & (max_new > 1)),
                out_buf=state.out_buf.at[slot].set(jnp.where(
                    valid,
                    jnp.zeros_like(state.out_buf[slot]).at[0].set(
                        jnp.where(store, tok, 0)),
                    state.out_buf[slot])),
                out_lp=state.out_lp.at[slot].set(jnp.where(
                    valid,
                    jnp.zeros_like(state.out_lp[slot]).at[0].set(
                        jnp.where(store, tok_lp, 0.0)),
                    state.out_lp[slot])),
                out_count=upd(state.out_count, jnp.where(store, 1, 0)),
                max_new=upd(state.max_new, max_new),
                stop_tokens=state.stop_tokens.at[slot].set(jnp.where(
                    valid, stop_tokens, state.stop_tokens[slot])),
                total_cap=upd(state.total_cap, total_cap),
                temps=upd(state.temps, temp),
                top_ks=upd(state.top_ks, top_k),
                top_ps=upd(state.top_ps, top_p),
                seeds=upd(state.seeds, seeds[i]),
                token_buf=state.token_buf.at[slot].set(jnp.where(
                    valid, all_tokens, state.token_buf[slot])),
            )
        return pool, state

    def _prefill_batch_impl(self, params, pool, state: DecodeState,
                            token_ids, seq_lens, page_tables, seeds, temps,
                            top_ks, top_ps, max_news, stop_tokens,
                            total_cap, slots, all_tokens, slot_base=0):
        """Burst prefill: B fresh prompts (no prefix, no forks) in ONE
        device call — batched flash kernel, flat batched KV write, one
        sampling call. Rows with slot -1 are padding (seq_len 0, sentinel
        table → KV to trash, insert masked). Under data parallelism
        `slot_base` masks rows owned by other replicas exactly as in
        `_prefill_impl`."""
        if page_tables.ndim == 3:  # [1, B, pps] per-replica under shard_map
            page_tables = page_tables[0]
        logits, pool = self.family.prefill_batch_forward(
            params, self.local_model, pool, token_ids, seq_lens,
            page_tables, interpret=self.interpret, tp_axis=self._tp_axis)
        toks, lps = sample_tokens_lp(logits, seeds, seq_lens, temps,
                                     top_ks, top_ps)
        B_local = state.last_token.shape[0]
        B = token_ids.shape[0]
        for b in range(B):
            tok, tok_lp = toks[b], lps[b]
            local = slots[b] - slot_base
            slot = jnp.clip(local, 0, B_local - 1)
            valid = (slots[b] >= 0) & (local >= 0) & (local < B_local)

            def upd(arr, val, slot=slot, valid=valid):
                return arr.at[slot].set(jnp.where(valid, val, arr[slot]))

            is_stop = jnp.any(tok == stop_tokens[b])
            store = ~is_stop & (max_news[b] >= 1)
            state = dataclasses.replace(
                state,
                last_token=upd(state.last_token, tok),
                tokens_in_kv=upd(state.tokens_in_kv, seq_lens[b]),
                active=upd(state.active, ~is_stop & (max_news[b] > 1)),
                out_buf=state.out_buf.at[slot].set(jnp.where(
                    valid,
                    jnp.zeros_like(state.out_buf[slot]).at[0].set(
                        jnp.where(store, tok, 0)),
                    state.out_buf[slot])),
                out_lp=state.out_lp.at[slot].set(jnp.where(
                    valid,
                    jnp.zeros_like(state.out_lp[slot]).at[0].set(
                        jnp.where(store, tok_lp, 0.0)),
                    state.out_lp[slot])),
                out_count=upd(state.out_count, jnp.where(store, 1, 0)),
                max_new=upd(state.max_new, max_news[b]),
                stop_tokens=state.stop_tokens.at[slot].set(jnp.where(
                    valid, stop_tokens[b], state.stop_tokens[slot])),
                total_cap=upd(state.total_cap, total_cap),
                temps=upd(state.temps, temps[b]),
                top_ks=upd(state.top_ks, top_ks[b]),
                top_ps=upd(state.top_ps, top_ps[b]),
                seeds=upd(state.seeds, seeds[b]),
                token_buf=state.token_buf.at[slot].set(jnp.where(
                    valid, all_tokens[b], state.token_buf[slot])),
            )
        return pool, state

    def _prefill_chunk_impl(self, params, pool, token_ids, seq_len,
                            page_table, *, prefix_tokens: int = 0):
        """KV-write-only forward of one prompt chunk (chunked prefill): the
        chunk attends over the pool-resident prefix, its K/V land in the
        pool, logits are discarded (no sampling, no slot insert)."""
        if page_table.ndim == 2:
            page_table = page_table[0]
        _, pool = self.family.prefill_forward(
            params, self.local_model, pool, token_ids, seq_len, page_table,
            start_pos=prefix_tokens, interpret=self.interpret,
            tp_axis=self._tp_axis)
        return pool

    def _seed_for(self, seq: Sequence) -> int:
        """Effective RNG seed: the request's SamplingParams.seed, or a
        deterministic per-sequence default (so multi-host replay agrees)."""
        if seq.sampling.seed is not None:
            return int(seq.sampling.seed) & 0xFFFFFFFF
        return (self._seed_base * 1000003 + seq.seq_id) & 0xFFFFFFFF

    # ----------------------------------------------------------------- prefill

    def bucket_for(self, length: int) -> int:
        for b in self.prefill_buckets:
            if length <= b:
                return b
        raise ValueError(
            f"chunk length {length} exceeds largest prefill bucket "
            f"{self.prefill_buckets[-1]}")

    def _emit(self, op: str, **kw) -> None:
        if self.command_sink is not None:
            self.command_sink.append((op, kw))

    def apply_commands(self, ops) -> None:
        """Replay a device-command log recorded by a primary engine (SPMD
        worker side of cross-host serving; see parallel/multihost.py)."""
        for op, kw in ops:
            getattr(self, "exec_" + op)(**kw)

    def prefill(self, seq: Sequence, slot: int,
                forks: Optional[List] = None) -> None:
        """Allocate pages, run the prompt, sample the first token, insert the
        sequence into the device slot. No host<->device sync.

        `forks` is a list of (child_seq, child_slot) pairs for n-best
        sampling: the prompt runs ONCE, every fork shares the parent's KV
        pages copy-on-write (the reference's `copy_blocks` consumer,
        `cache_kernels.cu:69-148`), and each fork samples its own first
        token from the shared prefill logits with its own seed.

        Caller must have checked `allocator.can_allocate` (+ one COW page
        per fork).
        """
        forks = list(forks or ())
        L = len(seq.prompt_ids)
        alloc = self.alloc_of_slot(slot)
        replica = self.replica_of_slot(slot)
        self.seq_replica[seq.seq_id] = replica

        # Prefix cache: adopt the longest cached page-aligned prefix
        # (shared read-only, refcounted) and prefill only the remainder —
        # at least one token must remain to produce the first logits.
        cached = 0
        if self.prefix_caches is not None:
            ps = self.config.cache.page_size
            cached, cpages = self.prefix_caches[replica].lookup(
                seq.prompt_ids, max_tokens=((L - 1) // ps) * ps)
            if cached:
                try:
                    alloc.adopt(seq.seq_id, cpages, cached)
                    alloc.reserve(seq.seq_id, L - cached)
                    alloc.advance(seq.seq_id, L - cached)
                except Exception:
                    # A failed reserve must not leave the adopted pages (or a
                    # partially-grown table) behind: the scheduler requeues
                    # the request and will re-run this whole path (ADVICE r2).
                    if alloc.has_seq(seq.seq_id):
                        alloc.free(seq.seq_id)
                    self.seq_replica.pop(seq.seq_id, None)
                    raise
                self.metrics.counter("prefix_cache_hit_tokens", cached)
        if not cached:
            alloc.allocate(seq.seq_id, L)
        table_row = alloc.padded_table(seq.seq_id)

        # Chunked prefill: all but the final chunk only write KV (each chunk
        # attends over the pool-resident prefix); the final chunk also
        # samples the first token and inserts the slot(s).
        start = cached
        while L - start > self.prefill_chunk:
            clen = self.prefill_chunk
            cpad = np.zeros(clen, np.int32)
            cpad[:] = seq.prompt_ids[start:start + clen]
            ckw = dict(padded=cpad, length=clen, table_row=table_row,
                       prefix_tokens=start, replica=np.int32(replica))
            self._emit("prefill_chunk", **ckw)
            self.exec_prefill_chunk(**ckw)
            start += clen
        rem = L - start
        bucket = self.bucket_for(rem)
        padded = np.zeros(bucket, np.int32)
        padded[:rem] = seq.prompt_ids[start:]

        s = seq.sampling
        stops = np.full(MAX_STOP_TOKENS, -1, np.int32)
        for i, t in enumerate(list(s.stop_token_ids)[:MAX_STOP_TOKENS]):
            stops[i] = t
        total_cap = min(self.max_context,
                        self.pages_per_seq_max * self.config.cache.page_size)
        # After recompute-preemption already-generated tokens live in
        # prompt_ids; the device budget is what REMAINS of max_new_tokens.
        already = len(seq.prompt_ids) - seq.orig_prompt_len
        remaining = max(0, s.max_new_tokens - already)

        seed = self._seed_for(seq)
        seq.rng_seed = seed
        slots = np.asarray([slot] + [sl for _, sl in forks], np.int32)
        seeds = np.asarray([seed] + [(seed + 1 + i) & 0xFFFFFFFF
                                     for i in range(len(forks))], np.uint32)
        for i, (child, child_slot) in enumerate(forks):
            if self.replica_of_slot(child_slot) != replica:
                raise ValueError("fork slots must share the data replica")
            alloc.fork(seq.seq_id, child.seq_id)
            self.seq_replica[child.seq_id] = replica
            child.rng_seed = int(seeds[1 + i])
        # Full committed-token row for the device-resident history buffer
        # (speculative n-gram drafting reads it; one small upload per
        # prefill either way).
        all_tokens = np.zeros(self.max_context, np.int32)
        all_tokens[:min(L, self.max_context)] = \
            seq.prompt_ids[:self.max_context]
        kw = dict(slots=slots, padded=padded, length=rem,
                  table_row=table_row, prefix_tokens=start,
                  temp=np.float32(0.0 if s.greedy else s.temperature),
                  top_k=np.int32(s.top_k), top_p=np.float32(s.top_p),
                  max_new=np.int32(remaining), stops=stops,
                  total_cap=np.int32(total_cap), seeds=seeds,
                  all_tokens=all_tokens)
        self._emit("prefill", **kw)
        self.exec_prefill(**kw)
        seq.tokens_in_kv = L
        seq.slot = slot
        if self.prefix_caches is not None:
            # Publish the freshly written full pages for future requests.
            self.prefix_caches[replica].insert(
                seq.prompt_ids, alloc.seq_pages(seq.seq_id))
        for child, child_slot in forks:
            child.tokens_in_kv = L
            child.slot = child_slot
            # The shared last page will be written by the child's first
            # decode step: give the child a private copy now (lazy COW).
            if L % self.config.cache.page_size != 0:
                pair = alloc.cow_last_page(child.seq_id)
                if pair is not None:
                    src, dst = pair
                    self._emit("cow", src=np.int32(src), dst=np.int32(dst),
                               replica=np.int32(replica))
                    self.exec_cow(src, dst, replica)
            child_row = alloc.padded_table(child.seq_id)
            self._tables_host[child_slot] = child_row
            self.metrics.counter("forks", 1)
        self._tables_dirty = True
        self.metrics.counter("prefill_tokens", L)

    def _replica_table(self, table_row, replica: int):
        if self.mesh is None:
            return jnp.asarray(table_row)
        # One row per data replica: only the owner's is real, the rest are
        # all-sentinel (their prefill writes hit their trash page).
        rows = np.full((self.dp, table_row.shape[0]),
                       self.config.cache.num_pages, np.int32)
        rows[replica] = table_row
        return jnp.asarray(rows)

    def exec_prefill(self, slots, padded, length, table_row, temp, top_k,
                     top_p, max_new, stops, total_cap, seeds, all_tokens,
                     prefix_tokens=0) -> None:
        self._tables_host[int(slots[0])] = table_row
        self._tables_dirty = True
        table_arg = self._replica_table(table_row,
                                        int(slots[0]) // self.local_slots)
        self.pool, self.state = self._prefill_fn(
            self.params, self.pool, self.state, jnp.asarray(padded),
            jnp.int32(length), table_arg,
            jnp.asarray(seeds, jnp.uint32),
            jnp.float32(temp), jnp.int32(top_k), jnp.float32(top_p),
            jnp.int32(max_new), jnp.asarray(stops),
            jnp.int32(total_cap), jnp.asarray(slots, jnp.int32),
            jnp.asarray(all_tokens),
            prefix_tokens=int(prefix_tokens))

    def exec_prefill_chunk(self, padded, length, table_row, prefix_tokens,
                           replica=0) -> None:
        """KV-write-only prefill of one page-aligned prompt chunk."""
        self.pool = self._prefill_chunk_fn(
            self.params, self.pool, jnp.asarray(padded), jnp.int32(length),
            self._replica_table(table_row, int(replica)),
            prefix_tokens=int(prefix_tokens))

    # ----------------------------------------------------- burst prefill

    def burst_eligible(self, seq: Sequence, replica: int) -> bool:
        """Can `seq` join a batched-prefill burst? Serial-path cases: fork
        groups (checked by the scheduler), prompts needing chunking or a
        bucket beyond the largest, and prefix-cache hits (adopting shared
        pages mid-burst would need per-row start offsets)."""
        if self.burst_max < 2:
            return False
        L = len(seq.prompt_ids)
        if L > self.prefill_buckets[-1] or L > self.prefill_chunk:
            return False
        if self.prefix_caches is not None:
            ps = self.config.cache.page_size
            cached, _ = self.prefix_caches[replica].lookup(
                seq.prompt_ids, max_tokens=((L - 1) // ps) * ps, peek=True)
            if cached:
                return False
        return True

    def burst_row_bucket(self, n: int) -> int:
        for b in self.burst_buckets:
            if n <= b:
                return b
        return self.burst_buckets[-1]

    def prefill_burst(self, items) -> None:
        """Admit `items` = [(seq, slot), ...] fresh simple prompts in ONE
        batched device call (VERDICT r2 #6: the reference prefills strictly
        serially on the event loop, `/root/reference/vllmini/server.py:81`;
        round 2 pipelined dispatch but the device still ran one prompt at a
        time). Caller guarantees each seq passed `burst_eligible` and pages
        were earmarked; on OutOfPages every allocation is rolled back."""
        allocated = []
        try:
            for seq, slot in items:
                alloc = self.alloc_of_slot(slot)
                self.seq_replica[seq.seq_id] = self.replica_of_slot(slot)
                alloc.allocate(seq.seq_id, len(seq.prompt_ids))
                allocated.append(seq)
        except Exception:
            for seq, slot in items:
                alloc = self.alloc_of_slot(slot)
                if seq in allocated and alloc.has_seq(seq.seq_id):
                    alloc.free(seq.seq_id)
                self.seq_replica.pop(seq.seq_id, None)
            raise

        n = len(items)
        B = self.burst_row_bucket(n)
        lenb = max(self.bucket_for(len(s.prompt_ids)) for s, _ in items)
        sentinel = self.config.cache.num_pages
        padded = np.zeros((B, lenb), np.int32)
        lens = np.zeros(B, np.int32)
        tables = np.full((B, self.pages_per_seq_max), sentinel, np.int32)
        slots_arr = np.full(B, -1, np.int32)
        all_tokens = np.zeros((B, self.max_context), np.int32)
        seeds = np.zeros(B, np.uint32)
        temps = np.zeros(B, np.float32)
        top_ks = np.zeros(B, np.int32)
        top_ps = np.ones(B, np.float32)
        max_news = np.zeros(B, np.int32)
        stops = np.full((B, MAX_STOP_TOKENS), -1, np.int32)
        total_cap = min(self.max_context,
                        self.pages_per_seq_max * self.config.cache.page_size)
        for b, (seq, slot) in enumerate(items):
            L = len(seq.prompt_ids)
            padded[b, :L] = seq.prompt_ids
            lens[b] = L
            all_tokens[b, :min(L, self.max_context)] = \
                seq.prompt_ids[:self.max_context]
            tables[b] = self.alloc_of_slot(slot).padded_table(seq.seq_id)
            slots_arr[b] = slot
            s = seq.sampling
            seed = self._seed_for(seq)
            seq.rng_seed = seed
            seeds[b] = seed
            temps[b] = 0.0 if s.greedy else s.temperature
            top_ks[b] = s.top_k
            top_ps[b] = s.top_p
            already = L - seq.orig_prompt_len
            max_news[b] = max(0, s.max_new_tokens - already)
            for i, t in enumerate(list(s.stop_token_ids)[:MAX_STOP_TOKENS]):
                stops[b, i] = t
        kw = dict(padded=padded, lens=lens, tables=tables, slots=slots_arr,
                  seeds=seeds, temps=temps, top_ks=top_ks, top_ps=top_ps,
                  max_news=max_news, stops=stops,
                  total_cap=np.int32(total_cap), all_tokens=all_tokens)
        self._emit("prefill_burst", **kw)
        self.exec_prefill_burst(**kw)
        for seq, slot in items:
            seq.tokens_in_kv = len(seq.prompt_ids)
            seq.slot = slot
            if self.prefix_caches is not None:
                replica = self.replica_of_slot(slot)
                self.prefix_caches[replica].insert(
                    seq.prompt_ids,
                    self.alloc_of_slot(slot).seq_pages(seq.seq_id))
            self.metrics.counter("prefill_tokens", len(seq.prompt_ids))
        self.metrics.counter("burst_prefills", 1)
        self.metrics.counter("burst_prefill_rows", n)

    def _replica_tables_batch(self, tables: np.ndarray,
                              slots: np.ndarray) -> jax.Array:
        if self.mesh is None:
            return jnp.asarray(tables)
        B = tables.shape[0]
        rows = np.full((self.dp, B, tables.shape[1]),
                       self.config.cache.num_pages, np.int32)
        for b in range(B):
            if slots[b] >= 0:
                rows[int(slots[b]) // self.local_slots, b] = tables[b]
        return jnp.asarray(rows)

    def exec_prefill_burst(self, padded, lens, tables, slots, seeds, temps,
                           top_ks, top_ps, max_news, stops, total_cap,
                           all_tokens) -> None:
        for b in range(len(slots)):
            if slots[b] >= 0:
                self._tables_host[int(slots[b])] = tables[b]
        self._tables_dirty = True
        self.pool, self.state = self._prefill_batch_fn(
            self.params, self.pool, self.state, jnp.asarray(padded),
            jnp.asarray(lens), self._replica_tables_batch(tables, slots),
            jnp.asarray(seeds, jnp.uint32), jnp.asarray(temps),
            jnp.asarray(top_ks), jnp.asarray(top_ps),
            jnp.asarray(max_news), jnp.asarray(stops),
            jnp.int32(total_cap), jnp.asarray(slots, jnp.int32),
            jnp.asarray(all_tokens))

    def exec_cow(self, src: int, dst: int, replica: int = 0) -> None:
        """Device-side page duplication for copy-on-write (the TPU
        `copy_blocks`, `cache_kernels.cu:69-148`): one page, all layers."""
        from ..ops.kv_write import copy_pages

        si = jnp.asarray(self._globalize_pages([src], replica), jnp.int32)
        di = jnp.asarray(self._globalize_pages([dst], replica), jnp.int32)
        pool = self.pool
        pool = dataclasses.replace(
            pool, kv_pages=[copy_pages(x, si, di) for x in pool.kv_pages])
        if pool.quantized:
            pool = dataclasses.replace(
                pool,
                kv_scales=[copy_pages(x, si, di) for x in pool.kv_scales])
        self.pool = pool

    # ------------------------------------------------------------------ decode

    def decode_chunk(self, step_budget: np.ndarray,
                     want_lp: bool = True,
                     all_greedy: bool = False) -> DecodeState:
        """Dispatch one K-step decode chunk (async; no device sync).

        Returns the post-chunk DecodeState snapshot: because only the pool is
        donated, the snapshot's buffers remain valid after LATER chunks are
        dispatched, so the scheduler can fetch its summary with a pipeline
        lag. An async device->host copy of the summary fields is started here
        so the lagged fetch usually finds the bytes already transferred.
        """
        self._emit("chunk", step_budget=np.asarray(step_budget, np.int32),
                   tables=self._tables_host.copy(), want_lp=bool(want_lp),
                   all_greedy=bool(all_greedy))
        return self.exec_chunk(np.asarray(step_budget, np.int32),
                               self._tables_host, want_lp=bool(want_lp),
                               all_greedy=bool(all_greedy))

    def exec_chunk(self, step_budget: np.ndarray, tables: np.ndarray,
                   want_lp: bool = True,
                   all_greedy: bool = False) -> DecodeState:
        if not np.array_equal(tables, self._tables_host):
            self._tables_host = np.array(tables)
            self._tables_dirty = True
        if self._tables_dirty or self._tables_dev is None:
            self._tables_dev = jnp.asarray(self._tables_host)
            self._tables_dirty = False
        self.pool, self.state = self._chunk_fn(
            self.params, self.pool, self.state, self._tables_dev,
            jnp.asarray(step_budget.astype(np.int32)),
            steps=self.chunk_steps, want_lp=bool(want_lp),
            all_greedy=bool(all_greedy))
        snapshot = self.state
        for arr in (snapshot.tokens_in_kv, snapshot.active,
                    snapshot.out_count, snapshot.out_buf, snapshot.out_lp,
                    snapshot.last_token):
            try:
                arr.copy_to_host_async()
            except AttributeError:  # interpret/CPU arrays
                break
        self.metrics.counter("decode_chunks", 1)
        return snapshot

    def fetch_summary(self, snapshot: Optional[DecodeState] = None
                      ) -> StateSummary:
        """ONE host<->device sync: read a chunk snapshot's small state arrays
        (defaults to the latest state)."""
        st = self.state if snapshot is None else snapshot
        tk, ac, oc, ob, olp, lt = jax.device_get(
            (st.tokens_in_kv, st.active, st.out_count, st.out_buf,
             st.out_lp, st.last_token))
        return StateSummary(np.asarray(tk), np.asarray(ac), np.asarray(oc),
                            np.asarray(ob), np.asarray(olp), np.asarray(lt))

    def spec_stats(self) -> dict:
        """Speculative-decoding acceptance counters (lifetime, all slots).
        One small device_get; {} when drafting is disabled."""
        if self.spec_tokens <= 0:
            return {}
        em, st = jax.device_get((self.state.spec_emitted,
                                 self.state.spec_steps))
        emitted, steps = int(np.sum(em)), int(np.sum(st))
        return {"spec_tokens_emitted": emitted,
                "spec_verify_steps": steps,
                "spec_tokens_per_step":
                    round(emitted / steps, 3) if steps else 0.0}

    def sync_slot(self, seq: Sequence) -> None:
        """Pull one slot's device state into the host Sequence (used before
        preempting a sequence that was admitted after the last chunk sync —
        its first sampled token exists only on device). One small device_get."""
        slot = seq.slot
        st = self.state
        tk, oc, ob, olp, lt = jax.device_get(
            (st.tokens_in_kv[slot], st.out_count[slot], st.out_buf[slot],
             st.out_lp[slot], st.last_token[slot]))
        delta = int(tk) - seq.tokens_in_kv
        if delta > 0:
            self.alloc_of_seq(seq.seq_id).advance(seq.seq_id, delta)
        seq.tokens_in_kv = int(tk)
        seq.output_ids = [int(t) for t in np.asarray(ob)[: int(oc)]]
        seq.output_logprobs = [float(x) for x in np.asarray(olp)[: int(oc)]]
        seq.last_token = int(lt)

    def clear_slot(self, slot: int) -> None:
        """Deactivate a slot on device (called on finish/abort/preempt)."""
        self._emit("clear_slot", slot=slot)
        self.exec_clear_slot(slot)

    def exec_clear_slot(self, slot: int) -> None:
        self.state = dataclasses.replace(
            self.state,
            active=self.state.active.at[slot].set(False))
        self._tables_host[slot] = self.config.cache.num_pages
        self._tables_dirty = True

    # ----------------------------------------------------------- free and swap

    def free_sequence(self, seq: Sequence) -> None:
        alloc = self.alloc_of_seq(seq.seq_id)
        if alloc.has_seq(seq.seq_id):
            alloc.free(seq.seq_id)
        self.seq_replica.pop(seq.seq_id, None)
        slot = -1 if seq.slot is None else seq.slot
        self._emit("free", seq_id=seq.seq_id, slot=slot)
        self.exec_free(seq.seq_id, slot)

    def exec_free(self, seq_id: int, slot: int) -> None:
        self._swapped.pop(seq_id, None)
        if slot >= 0:
            self.exec_clear_slot(slot)

    def convert_kv_dtype(self, kv_dtype: str) -> dict:
        """Re-precision the WARM KV cache in place — the serving surface of
        `memory/kv_cache.convert_pool` (TPU analog of the reference's
        `convert_fp8`, `cache_kernels.cu:322-392`). Running sequences keep
        decoding over the converted pages (within quantization noise);
        float -> int8/fp8 halves/quarters KV bytes without evicting anyone.

        Caller must hold the engine lock and have drained in-flight chunks
        (Scheduler.convert_kv_dtype does both). Multi-host replays this as a
        command like any other device mutation."""
        new_cache = dataclasses.replace(self.config.cache, kv_dtype=kv_dtype)
        if jnp.dtype(new_cache.jnp_kv_dtype) == jnp.dtype(
                self.config.cache.jnp_kv_dtype):
            return {"kv_dtype": kv_dtype, "converted": False,
                    "pool_bytes": self.pool.bytes()}
        if self.tp > 1:
            raise ValueError(
                "convert_kv_dtype with tensor_parallel > 1 is unsupported "
                "(per-shard lane padding)")
        if self._swapped:
            raise RuntimeError(
                "cannot convert the pool while sequences are swapped out "
                "(host blobs hold the old dtype); swap them in first")
        if not self.interpret and (
                self.config.cache.page_size % new_cache.sublane_tile):
            raise ValueError(
                f"page_size={self.config.cache.page_size} is not a multiple "
                f"of {new_cache.sublane_tile} required for "
                f"kv_dtype={kv_dtype} on TPU")
        self._emit("convert_pool", kv_dtype=kv_dtype)
        self.exec_convert_pool(kv_dtype)
        self.metrics.counter("pool_conversions", 1)
        return {"kv_dtype": kv_dtype, "converted": True,
                "pool_bytes": self.pool.bytes()}

    def exec_convert_pool(self, kv_dtype: str) -> None:
        from ..memory.kv_cache import convert_pool
        new_cache = dataclasses.replace(self.config.cache, kv_dtype=kv_dtype)
        self.pool = convert_pool(self.pool, new_cache.jnp_kv_dtype)
        self.config = dataclasses.replace(self.config, cache=new_cache)

    def swap_out(self, seq: Sequence) -> None:
        """Copy the sequence's KV pages to host RAM and release them.

        TPU analog of `swap_blocks` GPU->CPU (`cache_kernels.cu:24-63`) plus the
        bookkeeping `swap_to_cpu` (`block_manager.py:70-73`). Each host keeps
        only its own KV shard; swap-in restores shard-locally too.
        """
        # Gather only the FILLED pages: the table may hold reserved-but-empty
        # headroom pages beyond tokens_in_kv (chunk reservations), and swap-in
        # re-allocates from the token count alone. Windowed sequences save
        # only the live ring tail (pages below the window are dead).
        alloc = self.alloc_of_seq(seq.seq_id)
        filled = alloc.pages_needed(max(1, seq.tokens_in_kv))
        start = (max(0, filled - self.window_pages)
                 if self.window_pages else 0)
        pages = np.asarray(
            alloc.seq_pages(seq.seq_id)[start:filled], np.int32)
        slot = -1 if seq.slot is None else seq.slot
        replica = self.seq_replica.get(seq.seq_id, 0)
        self._emit("swap_out", seq_id=seq.seq_id, pages=pages,
                   num_tokens=seq.tokens_in_kv, slot=slot,
                   start_page=np.int32(start), replica=np.int32(replica))
        self.exec_swap_out(seq.seq_id, pages, seq.tokens_in_kv, slot, start,
                           replica)
        alloc.release_for_swap(seq.seq_id)
        self.seq_replica.pop(seq.seq_id, None)

    def exec_swap_out(self, seq_id: int, pages: np.ndarray, num_tokens: int,
                      slot: int, start_page: int = 0,
                      replica: int = 0) -> None:
        idx = jnp.asarray(self._globalize_pages(pages, int(replica)),
                          jnp.int32)

        def gather(layers):
            # [L, n_pages, ps, row_width|H] on host (token-major: pages dim 0)
            return np.stack([np.asarray(jax.device_get(x[idx]))
                             for x in layers])

        arrays = {"kv": gather(self.pool.kv_pages)}
        if self.pool.quantized:
            arrays["sc"] = gather(self.pool.kv_scales)
        self._swapped[seq_id] = SwappedKV(arrays, num_tokens,
                                          int(start_page))
        if slot >= 0:
            self.exec_clear_slot(slot)
        self.metrics.counter("swap_outs", 1)

    def can_swap_in(self, seq: Sequence, slot: Optional[int] = None) -> bool:
        alloc = (self.allocator if slot is None else self.alloc_of_slot(slot))
        return alloc.can_allocate(seq.tokens_in_kv)

    def swap_in(self, seq: Sequence, slot: int) -> None:
        """Re-allocate pages, restore KV from host RAM, re-insert the slot."""
        sw = self._swapped[seq.seq_id]
        num_tokens = sw.num_tokens
        alloc = self.alloc_of_slot(slot)
        self.seq_replica[seq.seq_id] = self.replica_of_slot(slot)
        table = alloc.allocate_for_swap_in(seq.seq_id, num_tokens)
        filled = alloc.pages_needed(max(1, num_tokens))
        # Land the saved content on the SAME logical slots it came from.
        pages = np.asarray(table[sw.start_page:filled], np.int32)
        s = seq.sampling
        stops = np.full(MAX_STOP_TOKENS, -1, np.int32)
        for i, t in enumerate(list(s.stop_token_ids)[:MAX_STOP_TOKENS]):
            stops[i] = t
        gen = seq.generated_ids()
        out_buf_row = np.zeros(self.state.out_buf.shape[1], np.int32)
        out_buf_row[: len(gen)] = gen
        out_lp_row = np.zeros(self.state.out_lp.shape[1], np.float32)
        lp = getattr(seq, "output_logprobs", []) or []
        out_lp_row[: min(len(lp), len(gen))] = lp[: len(gen)]
        all_ids = seq.all_token_ids()[: self.max_context]
        token_row = np.zeros(self.state.token_buf.shape[1], np.int32)
        token_row[: len(all_ids)] = all_ids
        kw = dict(
            token_row=token_row,
            seq_id=seq.seq_id, slot=slot, pages=pages,
            replica=np.int32(self.replica_of_slot(slot)),
            table_row=alloc.padded_table(seq.seq_id),
            last_token=np.int32(0 if seq.last_token is None
                                else seq.last_token),
            tokens_in_kv=np.int32(seq.tokens_in_kv),
            out_buf_row=out_buf_row, out_lp_row=out_lp_row,
            out_count=np.int32(len(gen)),
            max_new=np.int32(s.max_new_tokens), stops=stops,
            total_cap=np.int32(self.max_context),
            temp=np.float32(0.0 if s.greedy else s.temperature),
            top_k=np.int32(s.top_k), top_p=np.float32(s.top_p),
            seed=np.uint32(getattr(seq, "rng_seed", None)
                           or self._seed_for(seq)))
        self._emit("swap_in", **kw)
        self.exec_swap_in(**kw)
        seq.slot = slot

    def exec_swap_in(self, seq_id, slot, pages, table_row, last_token,
                     tokens_in_kv, out_buf_row, out_lp_row, out_count,
                     max_new, stops, total_cap, temp, top_k, top_p, seed,
                     token_row, replica=0) -> None:
        sw = self._swapped.pop(seq_id)
        idx = jnp.asarray(self._globalize_pages(pages, int(replica)),
                          jnp.int32)
        pool = self.pool

        def scatter(layers, host, dtype):
            return [x.at[idx].set(jnp.asarray(host[i], dtype))
                    for i, x in enumerate(layers)]

        pool = dataclasses.replace(
            pool,
            kv_pages=scatter(pool.kv_pages, sw.arrays["kv"],
                             pool.kv_pages[0].dtype),
        )
        if pool.quantized:
            pool = dataclasses.replace(
                pool,
                kv_scales=scatter(pool.kv_scales, sw.arrays["sc"],
                                  pool.kv_scales[0].dtype),
            )
        self.pool = pool
        st = self.state
        self.state = dataclasses.replace(
            st,
            last_token=st.last_token.at[slot].set(jnp.int32(last_token)),
            tokens_in_kv=st.tokens_in_kv.at[slot].set(
                jnp.int32(tokens_in_kv)),
            active=st.active.at[slot].set(True),
            out_buf=st.out_buf.at[slot].set(jnp.asarray(out_buf_row)),
            out_lp=st.out_lp.at[slot].set(jnp.asarray(out_lp_row)),
            out_count=st.out_count.at[slot].set(jnp.int32(out_count)),
            max_new=st.max_new.at[slot].set(jnp.int32(max_new)),
            stop_tokens=st.stop_tokens.at[slot].set(jnp.asarray(stops)),
            total_cap=st.total_cap.at[slot].set(jnp.int32(total_cap)),
            temps=st.temps.at[slot].set(jnp.float32(temp)),
            top_ks=st.top_ks.at[slot].set(jnp.int32(top_k)),
            top_ps=st.top_ps.at[slot].set(jnp.float32(top_p)),
            seeds=st.seeds.at[slot].set(jnp.uint32(seed)),
            token_buf=st.token_buf.at[slot].set(jnp.asarray(token_row)),
        )
        self._tables_host[slot] = table_row
        self._tables_dirty = True
        self.metrics.counter("swap_ins", 1)
