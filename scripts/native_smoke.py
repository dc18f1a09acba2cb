"""Native kernel smoke: compile + run every kernel variant ON THE REAL CHIP.

Pallas interpret mode (the CPU test suite) accepts several patterns Mosaic
rejects on hardware — e.g. bf16 vector compares (`arith.cmpf` on bf16 killed
the round-3 int4 unpack until scripts/bench_qmm.py caught it), sub-tile block
specs, i8 vector shifts. This script is the cheap gate: tiny hardware-aligned
shapes through every engine config + direct kernel path that round 3 touched,
asserting each compiles, runs, and produces finite/valid output natively.

Usage (on the TPU terminal): python scripts/native_smoke.py
Exit code 0 = all PASS. ~2-4 min including compiles.
"""

from __future__ import annotations

import os
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vllmini_tpu.config import (  # noqa: E402
    CacheConfig,
    EngineConfig,
    ModelConfig,
    QuantConfig,
    SamplingParams,
    SchedulerConfig,
)

RESULTS = []


def check(name):
    def deco(fn):
        RESULTS.append((name, fn))
        return fn
    return deco


def tiny_gpt2(**kw):
    return ModelConfig(family="gpt2", vocab_size=512, hidden_size=256,
                       num_layers=2, num_heads=2,
                       max_position_embeddings=256, dtype="bfloat16", **kw)


def tiny_llama(**kw):
    return ModelConfig(family="llama", vocab_size=512, hidden_size=256,
                       num_layers=2, num_heads=2, num_kv_heads=2,
                       intermediate_size=512, max_position_embeddings=512,
                       tie_word_embeddings=False, dtype="bfloat16", **kw)


def run_engine(model, *, kv_dtype="bfloat16", weight_dtype=None,
               spec_tokens=0, kv_partitions=0, page_size=32, n_req=4,
               max_new=8, prefix_cache=False):
    from vllmini_tpu.engine.engine import LLMEngine
    from vllmini_tpu.engine.scheduler import Scheduler

    quant = None
    params = None
    if weight_dtype is not None:
        from vllmini_tpu.models.registry import get_family
        from vllmini_tpu.ops.quant_matmul import quantize_params
        quant = QuantConfig(weight_dtype=weight_dtype)
        params = quantize_params(
            get_family(model).init_params(model, jax.random.PRNGKey(0)),
            quant, model_config=model)
    cfg = EngineConfig(
        model=model,
        cache=CacheConfig(num_pages=64, page_size=page_size,
                          max_pages_per_seq=8, kv_dtype=kv_dtype,
                          enable_prefix_cache=prefix_cache),
        scheduler=SchedulerConfig(max_decode_slots=4, decode_chunk_steps=4,
                                  prefill_buckets=(32, 64),
                                  speculative_tokens=spec_tokens,
                                  kv_partitions=kv_partitions),
        hf_model=None,
    )
    sched = Scheduler(LLMEngine(cfg, params=params))
    rng = np.random.default_rng(0)
    ids = [sched.add_request(
        rng.integers(0, model.vocab_size, 24).tolist(),
        SamplingParams(max_new_tokens=max_new, greedy=True))
        for _ in range(n_req)]
    sched.run_to_completion(max_steps=200)
    for rid in ids:
        seq = sched.get(rid)
        out = seq.generated_ids()
        assert len(out) == max_new, (rid, len(out))
        assert all(0 <= t < model.vocab_size for t in out), out


@check("gpt2 bf16 KV + speculative decode (write_kv_spec, verify fwd)")
def _():
    run_engine(tiny_gpt2(), spec_tokens=2)


@check("gpt2 int8 weights + int8 KV (qmm i8, quantized attn, scale pool)")
def _():
    run_engine(tiny_gpt2(), kv_dtype="int8", weight_dtype="int8")


@check("llama int4 weights + int8 KV + kv_partitions=2 (default unpack)")
def _():
    run_engine(tiny_llama(), kv_dtype="int8", weight_dtype="int4",
               kv_partitions=2)


@check("llama w8a8 weights + fp8_e4m3 KV + sliding window")
def _():
    run_engine(tiny_llama(sliding_window=64), kv_dtype="fp8_e4m3",
               weight_dtype="w8a8")


@check("llama w4a8 weights (packed int4 x int8 MXU) + int8 KV")
def _():
    run_engine(tiny_llama(), kv_dtype="int8", weight_dtype="w4a8")


@check("gpt2 prefix cache + burst admission (batched prefill)")
def _():
    run_engine(tiny_gpt2(), prefix_cache=True, n_req=6)


@check("paged_attention ALiBi (bf16 pool, fused write)")
def _():
    from vllmini_tpu.ops.kv_write import write_kv_prefill
    from vllmini_tpu.ops.paged_attention import (
        default_alibi_slopes, paged_attention)

    B, H, d, ps = 4, 2, 128, 32
    rw = H * d
    key = jax.random.PRNGKey(1)
    # Pages 0..15 for real data; page 16 is the trash page (last index).
    pool = jnp.zeros((17, 2, ps, rw), jnp.bfloat16)
    tables = jnp.arange(B * 4, dtype=jnp.int32).reshape(B, 4)
    L = 40
    k = jax.random.normal(key, (B, L, H, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 1), (B, L, H, d),
                          jnp.bfloat16)
    for b in range(B):
        # 5th arg is seq_len (true token count), NOT start_pos — passing 0
        # routed every page to the trash page and made the checks vacuous
        # (ADVICE r3, medium).
        pool = write_kv_prefill(pool, k[b], v[b], tables[b], L)
    assert float(jnp.abs(pool.astype(jnp.float32)).max()) > 0, \
        "KV pool untouched — prefill write went to the trash page"
    q = jax.random.normal(jax.random.fold_in(key, 2), (B, H, d),
                          jnp.bfloat16)
    seq_lens = jnp.full((B,), L, jnp.int32)
    out = paged_attention(q, pool, seq_lens, tables, num_kv_heads=H,
                          alibi_slopes=default_alibi_slopes(H))
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
    assert float(jnp.abs(out.astype(jnp.float32)).max()) > 1e-3


@check("paged_attention block-sparse (bf16 pool)")
def _():
    from vllmini_tpu.ops.kv_write import write_kv_prefill
    from vllmini_tpu.ops.paged_attention import BlockSparse, paged_attention

    B, H, d, ps = 4, 2, 128, 32
    rw = H * d
    key = jax.random.PRNGKey(3)
    pool = jnp.zeros((17, 2, ps, rw), jnp.bfloat16)  # page 16 = trash
    tables = jnp.arange(B * 4, dtype=jnp.int32).reshape(B, 4)
    L = 100
    k = jax.random.normal(key, (B, L, H, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 1), (B, L, H, d),
                          jnp.bfloat16)
    for b in range(B):
        pool = write_kv_prefill(pool, k[b], v[b], tables[b], L)
    assert float(jnp.abs(pool.astype(jnp.float32)).max()) > 0
    q = jax.random.normal(jax.random.fold_in(key, 2), (B, H, d),
                          jnp.bfloat16)
    seq_lens = jnp.full((B,), L, jnp.int32)
    out = paged_attention(q, pool, seq_lens, tables, num_kv_heads=H,
                          blocksparse=BlockSparse(2, 2, 32))
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
    assert float(jnp.abs(out.astype(jnp.float32)).max()) > 1e-3


@check("flash prefill ALiBi")
def _():
    from vllmini_tpu.ops.flash_attention import flash_attention_prefill
    from vllmini_tpu.ops.paged_attention import default_alibi_slopes

    H, L, d = 2, 128, 128
    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (H, L, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (H, L, d),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (H, L, d),
                          jnp.bfloat16)
    out = flash_attention_prefill(q, k, v, L,
                                  alibi_slopes=default_alibi_slopes(H))
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


@check("warm-cache convert_pool bf16 -> int8 on device")
def _():
    from vllmini_tpu.engine.engine import LLMEngine
    from vllmini_tpu.engine.scheduler import Scheduler

    model = tiny_gpt2()
    cfg = EngineConfig(
        model=model,
        cache=CacheConfig(num_pages=64, page_size=32, max_pages_per_seq=8,
                          kv_dtype="bfloat16"),
        scheduler=SchedulerConfig(max_decode_slots=2, decode_chunk_steps=4,
                                  prefill_buckets=(32,)),
        hf_model=None,
    )
    sched = Scheduler(LLMEngine(cfg))
    rid = sched.add_request(list(range(1, 17)),
                            SamplingParams(max_new_tokens=12, greedy=True))
    for _ in range(3):
        sched.step()
    sched.convert_kv_dtype("int8")
    sched.run_to_completion(max_steps=100)
    assert sched.get(rid).state.name == "FINISHED"


def main():
    if jax.default_backend() not in ("tpu",):
        print(f"NOT on TPU (backend={jax.default_backend()}) — this smoke "
              "only means something natively; running anyway.")
    failed = []
    for name, fn in RESULTS:
        try:
            fn()
            print(f"PASS  {name}", flush=True)
        except Exception:
            failed.append(name)
            print(f"FAIL  {name}", flush=True)
            traceback.print_exc()
    print(f"\n{len(RESULTS) - len(failed)}/{len(RESULTS)} native kernel "
          f"paths OK")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
