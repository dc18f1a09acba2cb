"""ALiBi bias in both attention kernels vs oracles (VERDICT r2 missing #1).

Reference anchor: `attention_kernels.cu:154-155,297` (per-head
`alibi_slope * (token_idx - context_len + 1)` added to scores pre-mask).
The fused-write path merges the self term outside with bias
slope*(cur-cur) = 0, so it needs no special casing; partitioned decode
anchors the bias in partition-local coordinates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.kernels.test_paged_attention import make_inputs
from vllmini_tpu.ops.flash_attention import (_dense_reference,
                                             flash_attention_prefill)
from vllmini_tpu.ops.paged_attention import (default_alibi_slopes,
                                             paged_attention,
                                             paged_attention_reference)


def test_default_slopes_standard_values():
    s = default_alibi_slopes(8)
    np.testing.assert_allclose(s, [2.0 ** -(i + 1) for i in range(8)],
                               rtol=1e-6)
    assert len(default_alibi_slopes(12)) == 12
    assert all(x > 0 for x in default_alibi_slopes(12))


@pytest.mark.parametrize(
    "batch,num_q_heads,num_kv_heads,seq_lens,partitions,fused",
    [
        (2, 4, 4, [37, 9], 1, False),       # MHA plain
        (3, 8, 2, [64, 1, 17], 1, False),   # GQA
        (2, 4, 4, [37, 9], 1, True),        # fused write (self term outside)
        (2, 4, 4, [50, 23], 2, False),      # partitioned (v2 regime)
    ],
)
def test_paged_alibi_matches_oracle(batch, num_q_heads, num_kv_heads,
                                    seq_lens, partitions, fused):
    head_dim, page_size, pages_per_seq = 64, 16, 4
    key = jax.random.PRNGKey(1)
    q, kv, sl, pt = make_inputs(
        key, batch=batch, num_q_heads=num_q_heads, num_kv_heads=num_kv_heads,
        head_dim=head_dim, num_pages=batch * pages_per_seq + 3,
        page_size=page_size, pages_per_seq=pages_per_seq, seq_lens=seq_lens)
    slopes = default_alibi_slopes(num_q_heads)
    ref = paged_attention_reference(q, kv, sl, pt, num_kv_heads=num_kv_heads,
                                    alibi_slopes=slopes)
    if fused:
        # The oracle attends over pool content incl. position sl-1; feed the
        # kernel the same rows as "new" so its fused write + outside self
        # term reproduce it. Stage a pool with the current rows zeroed.
        H, d = num_kv_heads, head_dim
        rows = []
        kv_blank = kv
        for b in range(batch):
            L = int(np.asarray(sl)[b])
            page = pt[b, (L - 1) // page_size]
            r = (L - 1) % page_size
            rows.append(np.asarray(kv[page, :, r, :H * d]).reshape(2, H, d))
            kv_blank = kv_blank.at[page, :, r].set(0.0)
        rows = jnp.asarray(np.stack(rows))      # [B, 2, H, d]
        out, _ = paged_attention(q, kv_blank, sl, pt,
                                 num_kv_heads=num_kv_heads,
                                 k_new=rows[:, 0], v_new=rows[:, 1],
                                 k_new_raw=rows[:, 0], v_new_raw=rows[:, 1],
                                 alibi_slopes=slopes, interpret=True)
    else:
        out = paged_attention(q, kv, sl, pt, num_kv_heads=num_kv_heads,
                              kv_partitions=partitions,
                              alibi_slopes=slopes, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("Lq,Lk,q_off", [(256, 256, 0), (128, 384, 256)])
def test_flash_alibi_matches_dense(Lq, Lk, q_off):
    H, Hkv, d = 8, 4, 64
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (H, Lq, d), jnp.float32)
    k = jax.random.normal(ks[1], (Hkv, Lk, d), jnp.float32)
    v = jax.random.normal(ks[2], (Hkv, Lk, d), jnp.float32)
    slopes = default_alibi_slopes(H)
    seq_len = jnp.int32(q_off + Lq - 3)
    out = flash_attention_prefill(q, k, v, seq_len, q_offset=q_off,
                                  alibi_slopes=slopes, interpret=True)
    ref = _dense_reference(q, k, v, seq_len, d ** -0.5, True,
                           -0.7 * float(jnp.finfo(jnp.float32).max),
                           q_offset=q_off, alibi_slopes=slopes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_flash_dense_fallback_alibi():
    """Short prompts take the dense path — same bias there."""
    H, d, L = 4, 32, 24
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (H, L, d), jnp.float32)
    slopes = default_alibi_slopes(H)
    out = flash_attention_prefill(q, q, q, jnp.int32(L),
                                  alibi_slopes=slopes, interpret=True)
    base = flash_attention_prefill(q, q, q, jnp.int32(L), interpret=True)
    # Bias is nonzero off the diagonal -> outputs must differ...
    assert not np.allclose(np.asarray(out), np.asarray(base))
    # ...and match the dense oracle exactly.
    ref = _dense_reference(q, q, q, jnp.int32(L), d ** -0.5, True,
                           -0.7 * float(jnp.finfo(jnp.float32).max),
                           alibi_slopes=slopes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
