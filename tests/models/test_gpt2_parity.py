"""GPT-2 logit parity vs HF transformers (torch CPU), plus prefill->decode
consistency through the paged KV cache.

The reference's analog is `vllmini/tests/model/test_gpt2.py` (prefill populates
caches; prefill+decode extends text). Here we check exact logits, not just text.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vllmini_tpu.config import CacheConfig, ModelConfig
from vllmini_tpu.memory.allocator import PageAllocator
from vllmini_tpu.memory.kv_cache import create_kv_pool
from vllmini_tpu.models.gpt2 import decode_forward, prefill_forward
from vllmini_tpu.models.loader import params_from_hf_model


@pytest.fixture(scope="module")
def tiny_gpt2():
    cfg = transformers.GPT2Config(
        vocab_size=256, n_positions=64, n_embd=32, n_layer=2, n_head=2,
    )
    torch.manual_seed(0)
    model = transformers.GPT2LMHeadModel(cfg).eval()
    config, params = params_from_hf_model(model, dtype=jnp.float32)
    return model, config, params


def hf_logits(model, ids):
    with torch.no_grad():
        out = model(torch.tensor([ids], dtype=torch.long))
    return out.logits[0].float().numpy()


def test_prefill_parity(tiny_gpt2):
    model, config, params = tiny_gpt2
    cache = CacheConfig(num_pages=16, page_size=4, max_pages_per_seq=8,
                        kv_dtype="float32")
    pool = create_kv_pool(config, cache)
    alloc = PageAllocator(cache.num_pages, cache.page_size,
                          cache.max_pages_per_seq)

    ids = [5, 9, 42, 7, 100, 3, 200]
    L = len(ids)
    alloc.allocate(1, L)
    table = jnp.asarray(alloc.padded_table(1))
    L_pad = 12
    padded = jnp.asarray(ids + [0] * (L_pad - L), jnp.int32)

    logits, pool = prefill_forward(params, config, pool, padded,
                                   jnp.int32(L), table, interpret=True)
    ref = hf_logits(model, ids)[-1]
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=2e-4)


def test_prefill_then_decode_parity(tiny_gpt2):
    model, config, params = tiny_gpt2
    cache = CacheConfig(num_pages=16, page_size=4, max_pages_per_seq=8,
                        kv_dtype="float32")
    pool = create_kv_pool(config, cache)
    alloc = PageAllocator(cache.num_pages, cache.page_size,
                          cache.max_pages_per_seq)

    prompt = [5, 9, 42, 7, 100]
    cont = [17, 88, 31]  # decode these one at a time
    L = len(prompt)
    alloc.allocate(1, L)
    padded = jnp.asarray(prompt + [0] * 3, jnp.int32)
    logits, pool = prefill_forward(
        params, config, pool, padded, jnp.int32(L),
        jnp.asarray(alloc.padded_table(1)), interpret=True)

    B = 2  # decode in a 2-slot batch with slot 1 inactive
    for step, tok in enumerate(cont):
        alloc.append_token(1)
        pos = L + step
        token_ids = jnp.asarray([tok, 0], jnp.int32)
        positions = jnp.asarray([pos, 0], jnp.int32)
        seq_lens = jnp.asarray([pos + 1, 0], jnp.int32)
        tables = jnp.stack([
            jnp.asarray(alloc.padded_table(1)),
            jnp.zeros(cache.max_pages_per_seq, jnp.int32),
        ])
        active = jnp.asarray([True, False])
        logits, pool = decode_forward(params, config, pool, token_ids,
                                      positions, seq_lens, tables, active,
                                      interpret=True)
        ref = hf_logits(model, prompt + cont[: step + 1])[-1]
        np.testing.assert_allclose(np.asarray(logits[0]), ref,
                                   atol=5e-4, rtol=5e-4)


def test_two_concurrent_sequences_isolated(tiny_gpt2):
    """Two sequences share the pool but must not interfere."""
    model, config, params = tiny_gpt2
    cache = CacheConfig(num_pages=16, page_size=4, max_pages_per_seq=8,
                        kv_dtype="float32")
    pool = create_kv_pool(config, cache)
    alloc = PageAllocator(cache.num_pages, cache.page_size,
                          cache.max_pages_per_seq)

    p1, p2 = [5, 9, 42], [7, 100, 3, 200, 17]
    alloc.allocate(1, len(p1))
    alloc.allocate(2, len(p2))
    pad = lambda ids, n: jnp.asarray(ids + [0] * (n - len(ids)), jnp.int32)
    _, pool = prefill_forward(params, config, pool, pad(p1, 8),
                              jnp.int32(len(p1)),
                              jnp.asarray(alloc.padded_table(1)),
                              interpret=True)
    _, pool = prefill_forward(params, config, pool, pad(p2, 8),
                              jnp.int32(len(p2)),
                              jnp.asarray(alloc.padded_table(2)),
                              interpret=True)

    # Decode one token for both in the same batch.
    alloc.append_token(1)
    alloc.append_token(2)
    token_ids = jnp.asarray([11, 22], jnp.int32)
    positions = jnp.asarray([len(p1), len(p2)], jnp.int32)
    seq_lens = positions + 1
    tables = jnp.stack([jnp.asarray(alloc.padded_table(1)),
                        jnp.asarray(alloc.padded_table(2))])
    active = jnp.asarray([True, True])
    logits, pool = decode_forward(params, config, pool, token_ids, positions,
                                  seq_lens, tables, active, interpret=True)
    ref1 = hf_logits(model, p1 + [11])[-1]
    ref2 = hf_logits(model, p2 + [22])[-1]
    np.testing.assert_allclose(np.asarray(logits[0]), ref1, atol=5e-4,
                               rtol=5e-4)
    np.testing.assert_allclose(np.asarray(logits[1]), ref2, atol=5e-4,
                               rtol=5e-4)
