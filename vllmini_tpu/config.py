"""Configuration system for vllmini-tpu.

The reference hardcodes every knob (see SURVEY.md §5.6: `vllmini/server.py:37-41,50`,
`vllmini/model/gpt2.py:18-19`, `vllmini/scheduler.py:146-148`). Here every constant the
reference buries in code is an explicit, validated dataclass field, so one engine binary
serves GPT-2 124M on CPU and Llama-70B on a multi-host v5e slice from config alone.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp

# Dtype names accepted in configs -> jnp dtypes.
_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
    "int8": jnp.int8,
    "fp8_e4m3": jnp.float8_e4m3fn,
    "fp8_e5m2": jnp.float8_e5m2,
}


def resolve_dtype(name) -> jnp.dtype:
    if not isinstance(name, str):
        return name
    try:
        return _DTYPES[name]
    except KeyError:
        raise ValueError(f"unknown dtype {name!r}; expected one of {sorted(_DTYPES)}")


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters (model-family agnostic).

    Covers GPT-2-style (learned positions, fused QKV, GELU MLP) and Llama-style
    (RoPE, GQA, SwiGLU, RMSNorm) families via the `family` switch.
    """

    family: str = "gpt2"  # "gpt2" | "llama" (llama serves Mistral/Qwen2 too)
    vocab_size: int = 50257
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    num_kv_heads: Optional[int] = None  # None -> MHA (== num_heads)
    head_dim: Optional[int] = None  # None -> hidden_size // num_heads
    intermediate_size: Optional[int] = None  # None -> 4*hidden (gpt2) / family default
    max_position_embeddings: int = 1024
    layer_norm_eps: float = 1e-5
    rope_theta: float = 10000.0  # llama only
    tie_word_embeddings: bool = True
    # QKV projection biases (Qwen2-style; o_proj stays bias-free).
    attention_bias: bool = False
    # Sliding-window attention (Mistral-style): each token attends to at most
    # the last `sliding_window` positions. None = full causal.
    sliding_window: Optional[int] = None
    # Mixture-of-Experts (mixtral family): expert count and router top-k.
    num_experts: int = 8
    num_experts_per_tok: int = 2
    dtype: str = "bfloat16"

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads if self.num_kv_heads is not None else self.num_heads

    @property
    def head_size(self) -> int:
        return self.head_dim if self.head_dim is not None else self.hidden_size // self.num_heads

    @property
    def mlp_size(self) -> int:
        if self.intermediate_size is not None:
            return self.intermediate_size
        return 4 * self.hidden_size

    @property
    def jnp_dtype(self):
        return resolve_dtype(self.dtype)

    def __post_init__(self):
        if self.hidden_size % self.num_heads != 0 and self.head_dim is None:
            raise ValueError("hidden_size must be divisible by num_heads")
        if self.num_kv_heads is not None and self.num_heads % self.num_kv_heads != 0:
            raise ValueError("num_heads must be a multiple of num_kv_heads (GQA)")

    @staticmethod
    def gpt2_124m(dtype: str = "bfloat16") -> "ModelConfig":
        return ModelConfig(family="gpt2", dtype=dtype)

    @staticmethod
    def gpt2_xl(dtype: str = "bfloat16") -> "ModelConfig":
        return ModelConfig(
            family="gpt2", hidden_size=1600, num_layers=48, num_heads=25, dtype=dtype
        )

    @staticmethod
    def llama3_8b(dtype: str = "bfloat16") -> "ModelConfig":
        return ModelConfig(
            family="llama",
            vocab_size=128256,
            hidden_size=4096,
            num_layers=32,
            num_heads=32,
            num_kv_heads=8,
            intermediate_size=14336,
            max_position_embeddings=8192,
            layer_norm_eps=1e-5,
            rope_theta=500000.0,
            tie_word_embeddings=False,
            dtype=dtype,
        )

    @staticmethod
    def mistral_7b(dtype: str = "bfloat16") -> "ModelConfig":
        return ModelConfig(
            family="llama",
            vocab_size=32000,
            hidden_size=4096,
            num_layers=32,
            num_heads=32,
            num_kv_heads=8,
            intermediate_size=14336,
            max_position_embeddings=32768,
            rope_theta=10000.0,
            tie_word_embeddings=False,
            sliding_window=4096,
            dtype=dtype,
        )

    @staticmethod
    def mixtral_8x7b(dtype: str = "bfloat16") -> "ModelConfig":
        return ModelConfig(
            family="mixtral",
            vocab_size=32000,
            hidden_size=4096,
            num_layers=32,
            num_heads=32,
            num_kv_heads=8,
            intermediate_size=14336,
            max_position_embeddings=32768,
            rope_theta=1000000.0,
            tie_word_embeddings=False,
            num_experts=8,
            num_experts_per_tok=2,
            dtype=dtype,
        )

    @staticmethod
    def qwen2_7b(dtype: str = "bfloat16") -> "ModelConfig":
        return ModelConfig(
            family="llama",
            vocab_size=152064,
            hidden_size=3584,
            num_layers=28,
            num_heads=28,
            num_kv_heads=4,
            intermediate_size=18944,
            max_position_embeddings=32768,
            rope_theta=1000000.0,
            tie_word_embeddings=False,
            attention_bias=True,
            dtype=dtype,
        )

    @staticmethod
    def llama3_70b(dtype: str = "bfloat16") -> "ModelConfig":
        return ModelConfig(
            family="llama",
            vocab_size=128256,
            hidden_size=8192,
            num_layers=80,
            num_heads=64,
            num_kv_heads=8,
            intermediate_size=28672,
            max_position_embeddings=8192,
            rope_theta=500000.0,
            tie_word_embeddings=False,
            dtype=dtype,
        )


@dataclasses.dataclass(frozen=True)
class CacheConfig:
    """Paged KV cache geometry + quantization.

    Reference counterpart: `vllmini/kv_cache.py:10-19` (num_blocks/block_size/
    max_blocks_per_seq hardcoded at `vllmini/server.py:37-41`). Unlike the reference,
    one page table is shared across layers (SURVEY.md §7 design deltas) and the cache
    dtype is configurable, including int8/fp8 with per-token scales.
    """

    num_pages: int = 1024
    page_size: int = 16
    max_pages_per_seq: int = 16
    # "bfloat16"|"float16"|"float32"|"int8"|"fp8_e4m3"|"fp8_e5m2" — float16
    # matches the reference's cache dtype (`kv_cache.py:13-14`); bf16 is the
    # right TPU default (same bytes, no overflow cliffs).
    kv_dtype: str = "bfloat16"
    # Deprecated (token-major pool rows are 128-aligned by construction, with
    # no per-head lane padding); accepted so older configs keep loading.
    head_pad_to: int = 128
    # Automatic prefix caching: requests sharing a page-aligned prompt
    # prefix reuse its KV pages copy-on-write instead of re-prefilling
    # (LRU-evicted when the pool needs pages back).
    enable_prefix_cache: bool = False
    # Run-granular page allocation: grant sequences CONTIGUOUS runs of this
    # many physical pages so the attention kernel's per-block gather is one
    # multi-page DMA (descriptor issue on the scalar core is its binding
    # cost). None = auto: one attention compute block's worth of pages when
    # the pool is ample (>= half the worst-case demand), else off. 1 = off.
    # Correctness never depends on it (the kernel checks contiguity per
    # block at runtime); it only trades earlier page reservation (more
    # preemption pressure under tight pools) for fewer DMA descriptors.
    alloc_run_pages: Optional[int] = None

    @property
    def max_context_len(self) -> int:
        return self.max_pages_per_seq * self.page_size

    @property
    def jnp_kv_dtype(self):
        return resolve_dtype(self.kv_dtype)

    @property
    def quantized(self) -> bool:
        return self.kv_dtype in ("int8", "fp8_e4m3", "fp8_e5m2")

    @property
    def sublane_tile(self) -> int:
        """Min page_size granularity for native TPU DMA of one page."""
        return {"float32": 8, "bfloat16": 16, "float16": 16,
                "int8": 32, "fp8_e4m3": 32, "fp8_e5m2": 32}[self.kv_dtype]

    def row_width(self, num_kv_heads: int, head_size: int,
                  shards: int = 1) -> int:
        """Token-major pool row width (see memory/kv_cache.align_row_width)."""
        from .memory.kv_cache import align_row_width
        return align_row_width(num_kv_heads, head_size, shards)

    def __post_init__(self):
        if self.page_size < 1:
            raise ValueError("page_size must be >= 1")
        if self.num_pages < 1:
            raise ValueError("num_pages must be >= 1")


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """Continuous-batching scheduler knobs.

    The reference runs strict FCFS, one sequence and one token per forward
    (`vllmini/scheduler.py:60,78-98`); here decode runs a fixed-shape batch of
    `max_decode_slots` slots with admission on token boundaries.
    """

    max_decode_slots: int = 8
    max_queued_requests: int = 1024
    prefill_buckets: Sequence[int] = (16, 32, 64, 128, 256, 512, 1024)
    default_max_new_tokens: int = 20
    # Decode steps per jitted chunk: the host syncs with the device once per
    # chunk, so this amortizes the host<->device round trip (which costs ~25 ms
    # through a tunneled TPU) at the price of up to K-1 wasted steps after a
    # mid-chunk EOS and K-step admission latency for queued requests.
    decode_chunk_steps: int = 16
    # KV partitions per sequence for decode attention (the reference's
    # `paged_attention_v2` regime): each sequence's page table is split into
    # this many grid programs with an LSE merge — long-context LOW-BATCH
    # decode keeps the DMA pipeline full. 0 = auto (picked from batch size
    # and max context at engine init), 1 = always the fused single-program
    # path.
    kv_partitions: int = 0
    # Decode chunks in flight before the scheduler blocks on a summary fetch.
    # Depth 2 hides the host<->device round trip behind device compute (the
    # fetch at tick t reads chunk t-1's state while chunk t runs); depth 1
    # restores strictly synchronous dispatch-then-fetch ticks. The cost of
    # depth d: finish/admission decisions lag d-1 chunks and page headroom is
    # reserved for d chunks.
    pipeline_depth: int = 2
    # Preemption: when the page pool is exhausted mid-decode, evict the
    # most-recently-admitted sequence (the reference's OOM policy,
    # `vllmini/scheduler.py:117-130`) and either swap its pages to host or requeue.
    preemption_mode: str = "swap"  # "swap" | "recompute"
    # Finished-result garbage collection: clients that never DELETE their
    # results must not grow scheduler.sequences without bound (the reference
    # one-shot-deletes on fetch, `vllmini/server.py:101-102`; we keep results
    # fetchable but bounded). A finished, unfetched result is evicted once it
    # is older than `finished_ttl_s` OR the finished set exceeds
    # `max_finished` (oldest first). <=0 disables either limit.
    finished_ttl_s: float = 600.0
    max_finished: int = 4096
    # Burst prefill: up to this many waiting prompts are admitted in ONE
    # batched device call (the reference's worst serving bottleneck is
    # strictly serial per-prompt prefill on the event loop,
    # `vllmini/server.py:81`). Bursts are padded up to a power-of-two row
    # count to bound compile shapes. 1 disables batching (serial prefill).
    # Prompts with a prefix-cache hit, fork groups (n>1), and prompts
    # longer than the largest prefill bucket always take the serial path.
    prefill_burst: int = 8
    # Speculative decoding (n-gram / prompt-lookup drafting): each decode
    # step drafts up to `speculative_tokens` continuations by matching the
    # last `speculative_ngram` committed tokens against the sequence's own
    # history (device-resident, no host sync, no draft model) and verifies
    # draft + bonus token in ONE weight stream. Output is BIT-IDENTICAL to
    # plain decoding (greedy and seeded sampling alike): a draft is accepted
    # only when it equals the token the verifier sampled at that position.
    # 0 disables. Weight-bound decode (large model, small batch) gains up to
    # (1 + accepted)/step; adversarial text degenerates to 1 token/step
    # plus the (cheap, batched) rejected-verify work.
    speculative_tokens: int = 0
    speculative_ngram: int = 3


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Weight quantization. KV-cache quantization lives in CacheConfig.

    "int8"/"int4" are weight-only (dequant fused after the HBM->VMEM stream);
    "w8a8"/"w4a8" also quantize activations per token at run time and run the
    matmul int8 x int8 on the MXU with int32 accumulation (BASELINE config 4).
    """

    weight_dtype: str = "none"  # "none" | "int8" | "int4" | "w8a8" | "w4a8"
    group_size: int = 128  # per-group scales along the contraction dim
    # Data-free scale equalization folded into norms/producers before
    # quantizing (ops/quant_equalize.py); needs the model config at
    # quantize_params time to know the fold map.
    equalize: bool = True
    # Per-(group, channel) MSE-optimal clip search (int4 only; int8's 255
    # levels make plain round-to-nearest already near-optimal).
    clip_search: bool = True

    @property
    def enabled(self) -> bool:
        return self.weight_dtype != "none"


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh geometry. axis names: "data" (DP) × "model" (TP)."""

    data_parallel: int = 1
    tensor_parallel: int = 1

    @property
    def world_size(self) -> int:
        return self.data_parallel * self.tensor_parallel


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling parameters.

    The reference hardcodes top_k=50, temperature=1.0 (`vllmini/scheduler.py:146-148`)
    and ignores the request's max_length (`vllmini/server.py:13-14` vs `:50`). Here both
    are honored per request.
    """

    max_new_tokens: int = 20
    temperature: float = 1.0
    # NOTE top_k is served from a static top-64 candidate set selected with
    # `lax.approx_max_k(recall=0.99)`: requested top_k > 64 is effectively
    # top-64, and with temperature > 0 the true argmax can miss the candidate
    # set ~1% of steps (greedy/temperature-0 uses the exact argmax). See
    # engine/sampling.py.
    top_k: int = 50
    top_p: float = 1.0
    greedy: bool = False
    stop_token_ids: Sequence[int] = ()
    # Per-request RNG seed: the same seed + prompt reproduces the completion
    # exactly, independent of batch composition (None -> deterministic
    # per-sequence default).
    seed: Optional[int] = None
    # Capture per-token log-probs on device at sample time (OpenAI
    # `logprobs`). Off by default: the log-softmax normalization is an extra
    # full pass over [B, vocab] logits EVERY decode step, paid by the whole
    # batch whenever any running request wants it.
    logprobs: bool = False
    # Number of completions sharing one prompt prefill (n-best sampling):
    # forks share the prompt's KV pages copy-on-write and diverge from the
    # first sampled token, each on its own seed stream.
    n: int = 1


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    cache: CacheConfig = dataclasses.field(default_factory=CacheConfig)
    scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    quant: QuantConfig = dataclasses.field(default_factory=QuantConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)
    # hf model id used by the weight loader; None -> random init
    hf_model: Optional[str] = "gpt2"
    seed: int = 0
    # Fuse QKV / gate-up projections into single matmuls at engine init
    # (models/fuse.py) — numerically identical, fewer weight streams.
    fuse_projections: bool = True
