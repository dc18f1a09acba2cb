"""Mistral (sliding window) and Qwen2 (QKV bias) logit parity vs HF.

Both serve through the llama family; tiny random HF models, torch CPU.
"""

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


def hf_logits(model, ids):
    with torch.no_grad():
        out = model(torch.tensor([ids], dtype=torch.long))
    return out.logits[0].float().numpy()


def _run_parity(model, config, params, prompt, n_decode=2):
    cache = CacheConfig(num_pages=16, page_size=4, max_pages_per_seq=8,
                        kv_dtype="float32", head_pad_to=1)
    pool = create_kv_pool(config, cache)
    alloc = PageAllocator(cache.num_pages, cache.page_size,
                          cache.max_pages_per_seq)
    L = len(prompt)
    alloc.allocate(1, L)
    pad = (-L) % 4
    padded = jnp.asarray(prompt + [0] * pad, jnp.int32)
    logits, pool = prefill_forward(params, config, pool, padded,
                                   jnp.int32(L),
                                   jnp.asarray(alloc.padded_table(1)),
                                   interpret=True)
    ref = hf_logits(model, prompt)[-1]
    np.testing.assert_allclose(np.asarray(logits), ref, atol=5e-4, rtol=5e-4)

    ids = list(prompt)
    for step in range(n_decode):
        tok = 7 + 3 * step
        ids.append(tok)
        alloc.append_token(1)
        pos = L + step
        logits, pool = decode_forward(
            params, config, pool,
            jnp.asarray([tok], jnp.int32), jnp.asarray([pos], jnp.int32),
            jnp.asarray([pos + 1], jnp.int32),
            jnp.asarray(alloc.padded_table(1))[None],
            jnp.asarray([True]), interpret=True)
        ref = hf_logits(model, ids)[-1]
        np.testing.assert_allclose(np.asarray(logits[0]), ref,
                                   atol=5e-4, rtol=5e-4)


def test_mistral_sliding_window_parity():
    cfg = transformers.MistralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        sliding_window=4, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.MistralForCausalLM(cfg).eval()
    config, params = params_from_hf_model(model, dtype=jnp.float32)
    assert config.sliding_window == 4
    # Prompt LONGER than the window so masking actually matters.
    _run_parity(model, config, params, [3, 45, 77, 12, 9, 21, 5], n_decode=3)


def test_qwen2_attention_bias_parity():
    cfg = transformers.Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = transformers.Qwen2ForCausalLM(cfg).eval()
    config, params = params_from_hf_model(model, dtype=jnp.float32)
    assert config.attention_bias
    assert "bq" in params["blocks"][0]["attn"]
    # Qwen2 initializes biases to zero; add real values so the test bites.
    with torch.no_grad():
        for layer in model.model.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                         layer.self_attn.v_proj):
                proj.bias.normal_(0, 0.5)
    config, params = params_from_hf_model(model, dtype=jnp.float32)
    _run_parity(model, config, params, [3, 45, 77, 12, 9], n_decode=2)
