"""Paged-attention decode kernel vs naive oracle (token-major interleaved).

Mirrors the reference's oracle pattern (`vllmini/tests/kernels/paged_attention.py:84-139`:
paged kernel vs hand-written vanilla attention, atol=1e-2) but runs on CPU via Pallas
interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllmini_tpu.ops.paged_attention import (
    align_row_width,
    paged_attention,
    paged_attention_reference,
    select_heads_per_matmul,
)


def make_inputs(key, *, batch, num_q_heads, num_kv_heads, head_dim, num_pages,
                page_size, pages_per_seq, seq_lens, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    W = align_row_width(num_kv_heads, head_dim)
    q = jax.random.normal(ks[0], (batch, num_q_heads, head_dim), dtype)
    kv = jax.random.normal(ks[1], (num_pages, 2, page_size, W), dtype)
    if W > num_kv_heads * head_dim:  # pad lanes are zero, as the writes keep
        kv = kv.at[..., num_kv_heads * head_dim:].set(0)
    # Distinct physical pages per (seq, logical page) — exercise the
    # indirection.
    perm = jax.random.permutation(ks[3], num_pages)[: batch * pages_per_seq]
    page_tables = perm.reshape(batch, pages_per_seq).astype(jnp.int32)
    seq_lens = jnp.asarray(seq_lens, jnp.int32)
    return q, kv, seq_lens, page_tables


def _quant_tokenmajor(kv, H, d):
    """Per-token-per-head int8 quantization of an interleaved pool."""
    P, _, ps, W = kv.shape
    x = kv[..., :H * d].reshape(P, 2, ps, H, d)
    amax = jnp.max(jnp.abs(x), axis=-1)
    # bf16-rounded scale + [P, 2, H, ps] token-on-lanes layout (the pool
    # contract, see memory/kv_cache.create_kv_pool).
    scale = jnp.maximum(amax / 127.0, 1e-8).astype(jnp.bfloat16)
    qv = jnp.clip(jnp.round(x / scale.astype(jnp.float32)[..., None]),
                  -127, 127)
    flat = qv.reshape(P, 2, ps, H * d)
    if W > H * d:
        flat = jnp.pad(flat, ((0, 0),) * 3 + ((0, W - H * d),))
    return flat.astype(jnp.int8), scale.transpose(0, 1, 3, 2)


@pytest.mark.parametrize(
    "batch,num_q_heads,num_kv_heads,head_dim,page_size,pages_per_seq,seq_lens",
    [
        (1, 4, 4, 64, 16, 4, [37]),                      # MHA, mid-page length
        (3, 8, 2, 64, 16, 4, [64, 1, 17]),               # GQA group=4
        (2, 4, 1, 128, 8, 8, [64, 33]),                  # MQA, head_dim=128
        (4, 4, 4, 64, 16, 4, [16, 0, 5, 64]),            # inactive slot (len 0)
        (2, 12, 3, 64, 16, 4, [40, 64]),                 # W padded past H*d
    ],
)
def test_matches_oracle(batch, num_q_heads, num_kv_heads, head_dim, page_size,
                        pages_per_seq, seq_lens):
    key = jax.random.PRNGKey(0)
    q, kv, sl, pt = make_inputs(
        key, batch=batch, num_q_heads=num_q_heads, num_kv_heads=num_kv_heads,
        head_dim=head_dim, num_pages=batch * pages_per_seq + 3,
        page_size=page_size, pages_per_seq=pages_per_seq, seq_lens=seq_lens)
    out = paged_attention(q, kv, sl, pt, num_kv_heads=num_kv_heads,
                          interpret=True)
    ref = paged_attention_reference(q, kv, sl, pt,
                                    num_kv_heads=num_kv_heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # Inactive slots produce exact zeros.
    for b, L in enumerate(np.asarray(sl)):
        if L == 0:
            assert np.all(np.asarray(out[b]) == 0.0)


@pytest.mark.parametrize("hpm", [1, 2, 4])
def test_heads_per_matmul_variants(hpm):
    """Every legal block-diagonal grouping gives the same answer."""
    key = jax.random.PRNGKey(5)
    q, kv, sl, pt = make_inputs(
        key, batch=2, num_q_heads=8, num_kv_heads=4, head_dim=128,
        num_pages=12, page_size=16, pages_per_seq=4, seq_lens=[40, 64])
    ref = paged_attention_reference(q, kv, sl, pt, num_kv_heads=4)
    out = paged_attention(q, kv, sl, pt, num_kv_heads=4,
                          heads_per_matmul=hpm, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_select_heads_per_matmul():
    assert select_heads_per_matmul(12, 1, 64) == 12      # GPT-2: full merge
    assert select_heads_per_matmul(25, 1, 64) == 25      # GPT-2 XL
    assert select_heads_per_matmul(8, 4, 128) == 2       # Llama-8B GQA
    assert select_heads_per_matmul(8, 8, 128) == 1       # Llama-70B GQA
    assert select_heads_per_matmul(2, 1, 8) == 2         # tiny test model


def test_multi_block_iteration():
    """seq spans several compute blocks -> exercises double-buffered loop."""
    key = jax.random.PRNGKey(1)
    q, kv, sl, pt = make_inputs(
        key, batch=2, num_q_heads=4, num_kv_heads=4, head_dim=64,
        num_pages=70, page_size=16, pages_per_seq=32, seq_lens=[512, 200])
    out = paged_attention(q, kv, sl, pt, num_kv_heads=4,
                          pages_per_compute_block=4, interpret=True)
    ref = paged_attention_reference(q, kv, sl, pt, num_kv_heads=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("parts", [2, 4])
def test_kv_partitions_match_plain(parts):
    """The v2-analog partitioned grid + LSE merge == single-program result.

    Counterpart of `paged_attention_v2` + reduce
    (`attention_kernels.cu:529-669,845-928`)."""
    key = jax.random.PRNGKey(6)
    q, kv, sl, pt = make_inputs(
        key, batch=3, num_q_heads=8, num_kv_heads=2, head_dim=64,
        num_pages=100, page_size=16, pages_per_seq=32,
        seq_lens=[512, 37, 0])
    ref = paged_attention_reference(q, kv, sl, pt, num_kv_heads=2)
    out = paged_attention(q, kv, sl, pt, num_kv_heads=2,
                          kv_partitions=parts, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    assert np.all(np.asarray(out[2]) == 0.0)


def test_kv_partitions_sliding_window():
    key = jax.random.PRNGKey(7)
    q, kv, sl, pt = make_inputs(
        key, batch=2, num_q_heads=4, num_kv_heads=4, head_dim=64,
        num_pages=70, page_size=16, pages_per_seq=32, seq_lens=[490, 100])
    ref = paged_attention_reference(q, kv, sl, pt, num_kv_heads=4,
                                    sliding_window=64)
    out = paged_attention(q, kv, sl, pt, num_kv_heads=4,
                          sliding_window=64, kv_partitions=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_quantized_int8_kv():
    key = jax.random.PRNGKey(2)
    batch, heads, hd, psize, pps = 2, 4, 64, 16, 4
    q, kv, sl, pt = make_inputs(
        key, batch=batch, num_q_heads=heads, num_kv_heads=heads, head_dim=hd,
        num_pages=16, page_size=psize, pages_per_seq=pps, seq_lens=[40, 64])

    kvq, sc = _quant_tokenmajor(kv, heads, hd)
    out = paged_attention(q, kvq, sl, pt, num_kv_heads=heads,
                          kv_scales=sc, interpret=True)
    ref = paged_attention_reference(q, kv, sl, pt, num_kv_heads=heads)
    # int8 KV error budget
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_quantized_gqa():
    key = jax.random.PRNGKey(8)
    q, kv, sl, pt = make_inputs(
        key, batch=2, num_q_heads=8, num_kv_heads=2, head_dim=128,
        num_pages=16, page_size=16, pages_per_seq=4, seq_lens=[40, 64])
    kvq, sc = _quant_tokenmajor(kv, 2, 128)
    out = paged_attention(q, kvq, sl, pt, num_kv_heads=2,
                          kv_scales=sc, interpret=True)
    ref = paged_attention_reference(q, kv, sl, pt, num_kv_heads=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_bfloat16_io():
    key = jax.random.PRNGKey(3)
    q, kv, sl, pt = make_inputs(
        key, batch=2, num_q_heads=4, num_kv_heads=4, head_dim=64,
        num_pages=12, page_size=16, pages_per_seq=4, seq_lens=[20, 64],
        dtype=jnp.bfloat16)
    out = paged_attention(q, kv, sl, pt, num_kv_heads=4, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = paged_attention_reference(q, kv, sl, pt, num_kv_heads=4)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)


def test_fused_write_matches_separate():
    """paged_attention(k_new=, v_new=) == write_kv_decode then attention."""
    from vllmini_tpu.ops.kv_write import write_kv_decode

    key = jax.random.PRNGKey(4)
    batch, heads, hd, psize, pps = 3, 4, 64, 16, 4
    seq_lens = [37, 1, 49]  # includes a first-token (page start) case
    q, kv, sl, pt = make_inputs(
        key, batch=batch, num_q_heads=heads, num_kv_heads=heads, head_dim=hd,
        num_pages=batch * pps + 3, page_size=psize, pages_per_seq=pps,
        seq_lens=seq_lens)
    k_new = jax.random.normal(jax.random.PRNGKey(5), (batch, heads, hd))
    v_new = jax.random.normal(jax.random.PRNGKey(6), (batch, heads, hd))
    positions = sl - 1
    active = sl > 0

    # Oracle: write first, then attend over the updated pool.
    kv_ref = write_kv_decode(kv, k_new, v_new, positions, pt, active,
                             interpret=True)
    ref = paged_attention_reference(q, kv_ref, sl, pt, num_kv_heads=heads)

    out, kv_out = paged_attention(q, kv, sl, pt, num_kv_heads=heads,
                                  k_new=k_new, v_new=v_new, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # The pool must contain the written token rows (and nothing else changed).
    np.testing.assert_allclose(np.asarray(kv_out), np.asarray(kv_ref),
                               atol=0, rtol=0)


def test_fused_write_inactive_slot_untouched():
    """seq_len == 0 slots must neither write KV nor produce attention."""
    key = jax.random.PRNGKey(7)
    q, kv, sl, pt = make_inputs(
        key, batch=2, num_q_heads=4, num_kv_heads=4, head_dim=64,
        num_pages=11, page_size=16, pages_per_seq=4, seq_lens=[0, 33])
    k_new = jax.random.normal(jax.random.PRNGKey(8), (2, 4, 64))
    v_new = jax.random.normal(jax.random.PRNGKey(9), (2, 4, 64))
    out, kv_out = paged_attention(q, kv, sl, pt, num_kv_heads=4,
                                  k_new=k_new, v_new=v_new, interpret=True)
    assert np.all(np.asarray(out[0]) == 0.0)
    # Slot 0's pages are untouched (compare pool outside slot 1's written row).
    page1 = int(pt[1, 33 // 16])
    mask = np.ones(kv.shape[0], bool)
    mask[page1] = False
    np.testing.assert_array_equal(np.asarray(kv_out)[mask],
                                  np.asarray(kv)[mask])


def test_fused_write_quantized():
    from vllmini_tpu.ops.kv_write import quantize_decode_tokens, \
        write_kv_decode

    key = jax.random.PRNGKey(10)
    batch, heads, hd, psize, pps = 2, 4, 64, 16, 4
    q, kv, sl, pt = make_inputs(
        key, batch=batch, num_q_heads=heads, num_kv_heads=heads, head_dim=hd,
        num_pages=16, page_size=psize, pages_per_seq=pps, seq_lens=[40, 64])
    k_new = jax.random.normal(jax.random.PRNGKey(11), (batch, heads, hd))
    v_new = jax.random.normal(jax.random.PRNGKey(12), (batch, heads, hd))
    positions = sl - 1
    active = sl > 0

    kvq, sc = _quant_tokenmajor(kv, heads, hd)
    k_src, v_src, sc2 = quantize_decode_tokens(
        k_new, v_new, positions, pt, active, sc, jnp.int8)
    out, kvq_out = paged_attention(
        q, kvq, sl, pt, num_kv_heads=heads, kv_scales=sc2,
        k_new=k_src, v_new=v_src, k_new_raw=k_new, v_new_raw=v_new,
        interpret=True)

    kv_ref = write_kv_decode(kv.astype(jnp.float32), k_new, v_new,
                             positions, pt, active, interpret=True)
    ref = paged_attention_reference(q, kv_ref, sl, pt, num_kv_heads=heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=6e-2, rtol=6e-2)


def test_sliding_window_matches_oracle():
    key = jax.random.PRNGKey(30)
    q, kv, sl, pt = make_inputs(
        key, batch=3, num_q_heads=4, num_kv_heads=4, head_dim=64,
        num_pages=32, page_size=4, pages_per_seq=8, seq_lens=[30, 3, 17])
    for window in (4, 8, 100):
        out = paged_attention(q, kv, sl, pt, num_kv_heads=4,
                              sliding_window=window,
                              pages_per_compute_block=2, interpret=True)
        ref = paged_attention_reference(q, kv, sl, pt, num_kv_heads=4,
                                        sliding_window=window)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"window={window}")


def test_contiguous_run_fast_path_matches_permuted():
    """r5 gather fast path: CONTIGUOUS page tables (the allocator's
    run-granular mode) must give bit-identical results to a permuted
    mapping of the same logical content, and match the oracle. (The
    VLLMINI_GATHER_RUNS=0 escape hatch is process-level, read at trace
    time like VLLMINI_BLOCK_TOKENS — not togglable inside one test.)"""
    key = jax.random.PRNGKey(9)
    batch, H, d, ps, pps = 2, 4, 64, 16, 32  # ppb = 256/16 = 16 pages/block
    num_pages = batch * pps + 4
    q, kv, sl, _ = make_inputs(
        key, batch=batch, num_q_heads=H, num_kv_heads=H, head_dim=d,
        num_pages=num_pages, page_size=ps, pages_per_seq=pps,
        seq_lens=[512, 200])
    # Contiguous aligned runs: seq b owns pages [b*pps, (b+1)*pps).
    pt_contig = (jnp.arange(batch * pps, dtype=jnp.int32)
                 .reshape(batch, pps))
    ref = paged_attention_reference(q, kv, sl, pt_contig, num_kv_heads=H)
    out_fast = paged_attention(q, kv, sl, pt_contig, num_kv_heads=H,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # Same logical content scattered through a permutation (defeats the
    # fast path at runtime): identical output.
    perm = np.asarray(jax.random.permutation(jax.random.PRNGKey(3),
                                             num_pages))
    inv = np.empty_like(perm)
    inv[perm] = np.arange(num_pages)
    kv_scr = jnp.asarray(np.asarray(kv)[inv])      # kv_scr[perm[p]] == kv[p]
    pt_scr = jnp.asarray(perm[np.asarray(pt_contig)], jnp.int32)
    out_scr = paged_attention(q, kv_scr, sl, pt_scr, num_kv_heads=H,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out_scr), np.asarray(out_fast),
                               atol=0, rtol=0)
