"""Llama logit parity vs HF transformers (tiny random model, torch CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vllmini_tpu.config import CacheConfig
from vllmini_tpu.memory.allocator import PageAllocator
from vllmini_tpu.memory.kv_cache import create_kv_pool
from vllmini_tpu.models.llama import decode_forward, prefill_forward
from vllmini_tpu.models.loader import params_from_hf_model


@pytest.fixture(scope="module")
def tiny_llama():
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    config, params = params_from_hf_model(model, dtype=jnp.float32)
    return model, config, params


def hf_logits(model, ids):
    with torch.no_grad():
        out = model(torch.tensor([ids], dtype=torch.long))
    return out.logits[0].float().numpy()


def test_prefill_and_decode_parity(tiny_llama):
    model, config, params = tiny_llama
    cache = CacheConfig(num_pages=16, page_size=4, max_pages_per_seq=8,
                        kv_dtype="float32", head_pad_to=1)
    pool = create_kv_pool(config, cache)
    alloc = PageAllocator(cache.num_pages, cache.page_size,
                          cache.max_pages_per_seq)

    prompt = [3, 45, 77, 12, 9]
    L = len(prompt)
    alloc.allocate(1, L)
    padded = jnp.asarray(prompt + [0] * 3, jnp.int32)
    logits, pool = prefill_forward(params, config, pool, padded,
                                   jnp.int32(L),
                                   jnp.asarray(alloc.padded_table(1)),
                                   interpret=True)
    ref = hf_logits(model, prompt)[-1]
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4, rtol=3e-4)

    # Decode two continuation tokens (GQA paged decode path).
    cont = [100, 200]
    for step, tok in enumerate(cont):
        alloc.append_token(1)
        pos = L + step
        logits, pool = decode_forward(
            params, config, pool,
            jnp.asarray([tok], jnp.int32), jnp.asarray([pos], jnp.int32),
            jnp.asarray([pos + 1], jnp.int32),
            jnp.asarray(alloc.padded_table(1))[None], jnp.asarray([True]),
            interpret=True)
        ref = hf_logits(model, prompt + cont[: step + 1])[-1]
        np.testing.assert_allclose(np.asarray(logits[0]), ref,
                                   atol=1e-3, rtol=1e-3)
