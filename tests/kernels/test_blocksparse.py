"""Block-sparse decode attention vs the dense-mask oracle.

Reference anchor: `attention_kernels.cu:105-110,211-241` — the
IS_BLOCK_SPARSE template path (vLLM's Phi-3-Small pattern): KV sparsity
block b attended iff local (within `local_blocks` of the query's block) or
remote ((b + per-head phase) % vert_stride == 0), phase sliding on Q heads
(head_sliding_step >= 0) or KV heads (< 0). The reference's own Python
never enables it (`vllmini/model/gpt2.py` hardcodes the dense call); here
it is a first-class kernel mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.kernels.test_paged_attention import make_inputs
from vllmini_tpu.ops.paged_attention import (BlockSparse, paged_attention,
                                             paged_attention_reference)


@pytest.mark.parametrize(
    "batch,num_q_heads,num_kv_heads,seq_lens,bs,fused",
    [
        # MHA, Q-head sliding (Phi-3-Small-style)
        (2, 4, 4, [57, 9], BlockSparse(1, 3, 8, 1), False),
        # GQA, KV-head sliding
        (3, 8, 2, [64, 1, 33], BlockSparse(2, 4, 16, -2), False),
        # no sliding (shared phase), larger local neighborhood
        (2, 4, 4, [61, 40], BlockSparse(2, 2, 8, 0), False),
        # fused current-token write (self term merged outside)
        (2, 4, 4, [37, 22], BlockSparse(1, 3, 8, 1), True),
        # tp_rank shifts every head's phase
        (2, 4, 4, [57, 30], BlockSparse(1, 3, 8, 1, 1), False),
    ],
)
def test_blocksparse_matches_oracle(batch, num_q_heads, num_kv_heads,
                                    seq_lens, bs, fused):
    head_dim, page_size, pages_per_seq = 64, 16, 4
    key = jax.random.PRNGKey(3)
    q, kv, sl, pt = make_inputs(
        key, batch=batch, num_q_heads=num_q_heads, num_kv_heads=num_kv_heads,
        head_dim=head_dim, num_pages=batch * pages_per_seq + 3,
        page_size=page_size, pages_per_seq=pages_per_seq, seq_lens=seq_lens)
    ref = paged_attention_reference(q, kv, sl, pt, num_kv_heads=num_kv_heads,
                                    blocksparse=bs)
    if fused:
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
                                 blocksparse=bs, interpret=True)
    else:
        out = paged_attention(q, kv, sl, pt, num_kv_heads=num_kv_heads,
                              blocksparse=bs, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_blocksparse_actually_masks():
    """The pattern must differ from dense attention (guards against a mask
    that degenerates to all-True)."""
    batch, Hq, Hkv = 1, 4, 4
    key = jax.random.PRNGKey(5)
    q, kv, sl, pt = make_inputs(
        key, batch=batch, num_q_heads=Hq, num_kv_heads=Hkv, head_dim=64,
        num_pages=7, page_size=16, pages_per_seq=4, seq_lens=[64])
    bs = BlockSparse(1, 4, 8, 1)
    sparse = paged_attention(q, kv, sl, pt, num_kv_heads=Hkv,
                             blocksparse=bs, interpret=True)
    dense = paged_attention(q, kv, sl, pt, num_kv_heads=Hkv, interpret=True)
    assert not np.allclose(np.asarray(sparse), np.asarray(dense), atol=1e-4)


def test_blocksparse_rejects_partitions():
    q = jnp.zeros((2, 4, 64), jnp.float32)
    kv = jnp.zeros((9, 2, 16, 256), jnp.float32)
    sl = jnp.asarray([30, 20], jnp.int32)
    pt = jnp.arange(8, dtype=jnp.int32).reshape(2, 4)
    with pytest.raises(AssertionError):
        paged_attention(q, kv, sl, pt, num_kv_heads=4,
                        blocksparse=BlockSparse(1, 2, 8), kv_partitions=2,
                        interpret=True)
