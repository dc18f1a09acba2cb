"""Flash prefill kernel vs dense oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllmini_tpu.ops.flash_attention import (
    _dense_reference,
    flash_attention_prefill,
)


def mk(key, num_q_heads, num_kv_heads, L, head_dim, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (num_q_heads, L, head_dim), dtype)
    k = jax.random.normal(ks[1], (num_kv_heads, L, head_dim), dtype)
    v = jax.random.normal(ks[2], (num_kv_heads, L, head_dim), dtype)
    return q, k, v


@pytest.mark.parametrize("num_q_heads,num_kv_heads,L,head_dim,seq_len", [
    (2, 2, 256, 64, 256),    # full-length causal, MHA
    (4, 2, 256, 64, 200),    # GQA + padded tail
    (2, 1, 128, 128, 77),    # MQA, single q block
])
def test_flash_matches_dense(num_q_heads, num_kv_heads, L, head_dim, seq_len):
    q, k, v = mk(jax.random.PRNGKey(0), num_q_heads, num_kv_heads, L, head_dim)
    out = flash_attention_prefill(q, k, v, jnp.int32(seq_len),
                                  block_q=128, block_kv=128, interpret=True)
    sm = head_dim ** -0.5
    ref = _dense_reference(q, k, v, jnp.int32(seq_len), sm, True,
                           -0.7 * float(np.finfo(np.float32).max))
    # Padded rows (>= seq_len) are garbage-in-garbage-out; compare valid rows.
    np.testing.assert_allclose(np.asarray(out[:, :seq_len]),
                               np.asarray(ref[:, :seq_len]),
                               atol=2e-5, rtol=2e-5)


def test_short_prompt_dense_fallback():
    q, k, v = mk(jax.random.PRNGKey(1), 2, 2, 16, 64)
    out = flash_attention_prefill(q, k, v, jnp.int32(10), interpret=True)
    assert out.shape == (2, 16, 64)
    # Row 0 attends only to itself -> equals v row 0.
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(v[:, 0]),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("num_q_heads,num_kv_heads,window", [
    (2, 2, None),   # MHA
    (4, 2, None),   # GQA
    (4, 2, 100),    # GQA + sliding window
])
def test_flash_batch_matches_per_seq(num_q_heads, num_kv_heads, window):
    """Burst-prefill kernel: B prompts with different true lengths in one
    launch == B separate single-prompt launches (row for row)."""
    from vllmini_tpu.ops.flash_attention import flash_attention_prefill_batch

    B, L, head_dim = 3, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (B, num_q_heads, L, head_dim))
    k = jax.random.normal(ks[1], (B, num_kv_heads, L, head_dim))
    v = jax.random.normal(ks[2], (B, num_kv_heads, L, head_dim))
    seq_lens = jnp.asarray([256, 130, 5], jnp.int32)

    out = flash_attention_prefill_batch(q, k, v, seq_lens,
                                        sliding_window=window,
                                        interpret=True)
    assert out.shape == q.shape
    for b in range(B):
        ref = flash_attention_prefill(q[b], k[b], v[b], seq_lens[b],
                                      sliding_window=window, interpret=True)
        sl = int(seq_lens[b])
        np.testing.assert_allclose(np.asarray(out[b, :, :sl]),
                                   np.asarray(ref[:, :sl]),
                                   atol=2e-5, rtol=2e-5)


def test_flash_batch_zero_length_row_is_inert():
    """A padding row (seq_len 0, as the engine emits for burst row-bucket
    padding) must not poison other rows with NaN/Inf."""
    from vllmini_tpu.ops.flash_attention import flash_attention_prefill_batch

    ks = jax.random.split(jax.random.PRNGKey(8), 3)
    q = jax.random.normal(ks[0], (2, 2, 128, 64))
    k = jax.random.normal(ks[1], (2, 2, 128, 64))
    v = jax.random.normal(ks[2], (2, 2, 128, 64))
    out = flash_attention_prefill_batch(q, k, v,
                                        jnp.asarray([100, 0], jnp.int32),
                                        interpret=True)
    ref = flash_attention_prefill(q[0], k[0], v[0], jnp.int32(100),
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(out[0, :, :100]),
                               np.asarray(ref[:, :100]),
                               atol=2e-5, rtol=2e-5)
    assert np.isfinite(np.asarray(out[0, :, :100])).all()
