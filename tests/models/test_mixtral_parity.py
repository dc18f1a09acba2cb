"""Mixtral (MoE) logit parity vs HF transformers + EP engine parity.

The MoE family serves through the same engine; expert parallelism shards
experts across the mesh's model axis and rides the block's existing psum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vllmini_tpu.config import CacheConfig
from vllmini_tpu.memory.allocator import PageAllocator
from vllmini_tpu.memory.kv_cache import create_kv_pool
from vllmini_tpu.models.mixtral import decode_forward, prefill_forward
from vllmini_tpu.models.loader import params_from_hf_model


@pytest.fixture(scope="module")
def tiny_mixtral():
    cfg = transformers.MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        num_local_experts=4, num_experts_per_tok=2,
        sliding_window=None, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.MixtralForCausalLM(cfg).eval()
    config, params = params_from_hf_model(model, dtype=jnp.float32)
    assert config.family == "mixtral"
    assert config.num_experts == 4 and config.num_experts_per_tok == 2
    return model, config, params


def hf_logits(model, ids):
    with torch.no_grad():
        out = model(torch.tensor([ids], dtype=torch.long))
    return out.logits[0].float().numpy()


def test_prefill_and_decode_parity(tiny_mixtral):
    model, config, params = tiny_mixtral
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
    np.testing.assert_allclose(np.asarray(logits), ref, atol=5e-4, rtol=5e-4)

    ids = list(prompt)
    for step, tok in enumerate([100, 200]):
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


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_mixtral_ep_engine_matches_single_device():
    """Full engine under expert+tensor parallelism == single device greedy."""
    from vllmini_tpu.config import (EngineConfig, ModelConfig, ParallelConfig,
                                    SamplingParams, SchedulerConfig)
    from vllmini_tpu.engine.engine import LLMEngine
    from vllmini_tpu.engine.scheduler import Scheduler
    from vllmini_tpu.models.registry import get_family

    model_cfg = ModelConfig(family="mixtral", vocab_size=128, hidden_size=64,
                            num_layers=2, num_heads=8, num_kv_heads=4,
                            intermediate_size=96, max_position_embeddings=64,
                            num_experts=4, num_experts_per_tok=2,
                            dtype="float32")
    family = get_family(model_cfg)
    params = family.init_params(model_cfg, jax.random.PRNGKey(11))

    outs = {}
    for world in (1, 4):
        cfg = EngineConfig(
            model=model_cfg,
            cache=CacheConfig(num_pages=32, page_size=4, max_pages_per_seq=8,
                              kv_dtype="float32", head_pad_to=1),
            scheduler=SchedulerConfig(max_decode_slots=2,
                                      decode_chunk_steps=3,
                                      prefill_buckets=(8, 16)),
            parallel=ParallelConfig(tensor_parallel=world),
            hf_model=None,
        )
        engine = LLMEngine(cfg, params=jax.tree.map(jnp.copy, params))
        sched = Scheduler(engine)
        rid = sched.add_request([5, 9, 2, 11],
                                SamplingParams(max_new_tokens=8, greedy=True))
        sched.run_to_completion(max_steps=100)
        outs[world] = sched.get(rid).output_ids
        assert len(outs[world]) == 8
    assert outs[1] == outs[4], outs
