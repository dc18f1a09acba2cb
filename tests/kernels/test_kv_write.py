"""KV write ops: roundtrip tests (token-major interleaved layout).

Replicates the reference's `reshape_and_cache` roundtrip oracle
(`vllmini/tests/kernels/paged_attention.py:63-82`): scatter, then index the pool
back out and compare.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vllmini_tpu.ops.kv_write import (
    copy_pages,
    gather_pages,
    scatter_pages,
    write_kv_decode,
    write_kv_prefill,
)


def _row(pages, plane, pg, off, kvh, hd):
    """One token's [kvh, hd] slice out of an interleaved pool row."""
    return np.asarray(pages[pg, plane, off, :kvh * hd]).reshape(kvh, hd)


def test_decode_roundtrip_and_padding_drop():
    kvh, npages, psize, hd = 2, 8, 4, 8
    batch = 3
    W = 128  # aligned row width for kvh*hd = 16
    kv_pages = jnp.zeros((npages, 2, psize, W))
    key = jax.random.PRNGKey(0)
    k_new = jax.random.normal(key, (batch, kvh, hd))
    v_new = k_new + 1.0
    page_tables = jnp.array([[0, 1], [2, 3], [4, 5]], jnp.int32)
    positions = jnp.array([5, 0, 7], jnp.int32)  # pg1/off1, pg2/off0, pg5/off3
    active = jnp.array([True, True, False])

    kv_out = write_kv_decode(kv_pages, k_new, v_new, positions, page_tables,
                             active, interpret=True)
    np.testing.assert_allclose(_row(kv_out, 0, 1, 1, kvh, hd),
                               np.asarray(k_new[0]))
    np.testing.assert_allclose(_row(kv_out, 1, 2, 0, kvh, hd),
                               np.asarray(v_new[1]))
    # Inactive row 2 dropped: page 5 untouched (write went to the trash page).
    assert np.all(np.asarray(kv_out[5]) == 0.0)


def test_prefill_roundtrip_multi_page():
    kvh, npages, psize, hd = 2, 10, 4, 8
    W = 128
    kv_pages = jnp.zeros((npages, 2, psize, W))
    L_pad, seq_len = 12, 10  # spans 3 pages, 2 padding tokens
    key = jax.random.PRNGKey(1)
    k_new = jax.random.normal(key, (L_pad, kvh, hd))
    v_new = k_new * 2.0
    page_table = jnp.array([7, 3, 9, 0], jnp.int32)

    kv_out = write_kv_prefill(kv_pages, k_new, v_new, page_table,
                              jnp.int32(seq_len))
    for t in range(seq_len):
        pg = int(page_table[t // psize])
        off = t % psize
        np.testing.assert_allclose(_row(kv_out, 0, pg, off, kvh, hd),
                                   np.asarray(k_new[t]), atol=1e-6)
        np.testing.assert_allclose(_row(kv_out, 1, pg, off, kvh, hd),
                                   np.asarray(v_new[t]), atol=1e-6)
    # Tail slots of the LAST USED page may hold padding writes (whole-page DUS
    # semantics; they are masked by seq_len and overwritten by decode), but
    # pages beyond the prompt and unrelated pages must be untouched.
    assert np.all(np.asarray(kv_out[0]) == 0.0)  # table[3]=0, prompt uses 3
    assert np.all(np.asarray(kv_out[1]) == 0.0)  # not in table


def test_prefill_chunked_start_pos():
    """Two page-aligned chunks == one whole-prompt write (chunked prefill)."""
    kvh, npages, psize, hd = 2, 12, 4, 8
    W = 128
    zeros = jnp.zeros((npages, 2, psize, W))
    L = 14
    key = jax.random.PRNGKey(7)
    k_new = jax.random.normal(key, (16, kvh, hd))
    v_new = k_new * 3.0
    page_table = jnp.array([7, 3, 9, 5], jnp.int32)

    kv_whole = write_kv_prefill(zeros, k_new, v_new, page_table,
                                jnp.int32(L))
    # Chunk 1: tokens [0, 8); chunk 2: tokens [8, 14) (padded to 8).
    kv_c = write_kv_prefill(zeros, k_new[:8], v_new[:8], page_table,
                            jnp.int32(8))
    kv_c = write_kv_prefill(kv_c, k_new[8:], v_new[8:], page_table,
                            jnp.int32(L - 8), start_pos=8)
    # Compare only the rows that hold real tokens (padding tails differ:
    # the whole-prompt write pads from token 14, the chunked one from 6).
    for t in range(L):
        pg, off = int(page_table[t // psize]), t % psize
        for plane in (0, 1):
            np.testing.assert_allclose(_row(kv_c, plane, pg, off, kvh, hd),
                                       _row(kv_whole, plane, pg, off,
                                            kvh, hd))


def test_quantized_prefill_roundtrip():
    kvh, npages, psize, hd = 1, 4, 4, 16
    W = 128
    kv_pages = jnp.zeros((npages, 2, psize, W), jnp.int8)
    kv_scales = jnp.zeros((npages, 2, kvh, psize), jnp.bfloat16)
    L = 8
    key = jax.random.PRNGKey(2)
    k_new = jax.random.normal(key, (L, kvh, hd))
    v_new = k_new * 0.5
    page_table = jnp.array([1, 2], jnp.int32)
    kv_out, sc_out = write_kv_prefill(
        kv_pages, k_new, v_new, page_table, jnp.int32(L),
        kv_scales=kv_scales)
    # Dequantized roundtrip within int8 tolerance.
    for t in range(L):
        pg, off = int(page_table[t // psize]), t % psize
        deq = _row(kv_out, 0, pg, off, kvh, hd).astype(np.float32) * \
            np.asarray(sc_out[pg, 0, :, off], np.float32)[:, None]
        np.testing.assert_allclose(deq, np.asarray(k_new[t]), atol=2e-2)
        deq_v = _row(kv_out, 1, pg, off, kvh, hd).astype(np.float32) * \
            np.asarray(sc_out[pg, 1, :, off], np.float32)[:, None]
        np.testing.assert_allclose(deq_v, np.asarray(v_new[t]), atol=2e-2)


def test_copy_and_swap_pages():
    npages, psize, W = 6, 4, 128
    pages = jax.random.normal(jax.random.PRNGKey(3), (npages, 2, psize, W))
    out = copy_pages(pages, jnp.array([0, 1]), jnp.array([4, 5]))
    np.testing.assert_allclose(np.asarray(out[4]), np.asarray(pages[0]))
    np.testing.assert_allclose(np.asarray(out[5]), np.asarray(pages[1]))

    # swap out -> zero -> swap in restores contents
    dense = gather_pages(pages, jnp.array([2, 3]))
    cleared = pages.at[jnp.array([2, 3])].set(0.0)
    restored = scatter_pages(cleared, jnp.array([2, 3]), dense)
    np.testing.assert_allclose(np.asarray(restored), np.asarray(pages))


def test_prefill_batch_matches_serial():
    """Burst write: B prompts in one flat page loop == B serial
    write_kv_prefill calls, padding pages to the trash page."""
    from vllmini_tpu.ops.kv_write import write_kv_prefill_batch

    kvh, npages, psize, hd = 2, 16, 4, 8
    W = 128
    B, L = 3, 12
    key = jax.random.PRNGKey(3)
    k_new = jax.random.normal(key, (B, L, kvh, hd))
    v_new = k_new * 2.0 - 1.0
    seq_lens = jnp.asarray([12, 7, 0], jnp.int32)
    # Disjoint tables; row 2 is a padding row (all-sentinel).
    sentinel = npages - 1  # trash
    page_tables = jnp.asarray([[0, 1, 2, -1], [3, 4, sentinel, sentinel],
                               [sentinel] * 4], jnp.int32)

    out = write_kv_prefill_batch(jnp.zeros((npages, 2, psize, W)),
                                 k_new, v_new, page_tables, seq_lens)
    ref = jnp.zeros((npages, 2, psize, W))
    for b in range(2):
        ref = write_kv_prefill(ref, k_new[b], v_new[b], page_tables[b],
                               seq_lens[b], 0)
    # Trash page contents differ (scratch); everything else must match.
    np.testing.assert_array_equal(np.asarray(out[:sentinel]),
                                  np.asarray(ref[:sentinel]))


def test_prefill_batch_quantized_matches_serial():
    from vllmini_tpu.ops.kv_write import write_kv_prefill_batch

    kvh, npages, psize, hd = 2, 12, 4, 8
    W = 128
    B, L = 2, 8
    key = jax.random.PRNGKey(4)
    k_new = jax.random.normal(key, (B, L, kvh, hd))
    v_new = k_new + 0.5
    seq_lens = jnp.asarray([8, 5], jnp.int32)
    page_tables = jnp.asarray([[0, 1], [2, 3]], jnp.int32)

    pool = jnp.zeros((npages, 2, psize, W), jnp.int8)
    scales = jnp.zeros((npages, 2, kvh, psize), jnp.bfloat16)
    out, out_sc = write_kv_prefill_batch(pool, k_new, v_new, page_tables,
                                         seq_lens, kv_scales=scales)
    ref, ref_sc = jnp.zeros_like(pool), jnp.zeros_like(scales)
    for b in range(B):
        ref, ref_sc = write_kv_prefill(ref, k_new[b], v_new[b],
                                       page_tables[b], seq_lens[b], 0,
                                       kv_scales=ref_sc)
    trash = npages - 1
    np.testing.assert_array_equal(np.asarray(out[:trash]),
                                  np.asarray(ref[:trash]))
    np.testing.assert_array_equal(np.asarray(out_sc[:trash]),
                                  np.asarray(ref_sc[:trash]))
