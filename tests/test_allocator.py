"""Page-allocator property tests (no accelerator needed).

Parametrized over the Python reference implementation and the native C++
allocator (memory/native/allocator.cpp) — both must satisfy the same spec.
"""

import numpy as np
import pytest

from vllmini_tpu.memory.allocator import OutOfPages, PageAllocator
from vllmini_tpu.memory.native import NativePageAllocator, native_available


@pytest.fixture(params=["python", "native"])
def Alloc(request):
    if request.param == "native":
        if not native_available():
            pytest.skip("native allocator not built")
        return NativePageAllocator
    return PageAllocator


def test_allocate_and_padded_table(Alloc):
    a = Alloc(num_pages=10, page_size=4, pages_per_seq_max=4)
    pages = a.allocate(1, num_tokens=9)  # 3 pages
    assert len(pages) == 3
    assert a.num_free_pages == 7
    t = a.padded_table(1)
    assert t.shape == (4,)
    assert list(t[:3]) == pages
    assert t[3] == 10  # OOB sentinel


def test_no_double_allocation(Alloc):
    a = Alloc(8, 4, 4)
    p1 = a.allocate(1, 8)
    p2 = a.allocate(2, 8)
    assert set(p1).isdisjoint(p2)
    with pytest.raises(ValueError):
        a.allocate(1, 4)


def test_append_token_page_boundary(Alloc):
    a = Alloc(8, 4, 4)
    a.allocate(1, 4)  # exactly one full page
    assert a.seq_len(1) == 4
    new = a.append_token(1)  # boundary -> new page
    assert new is not None
    assert a.seq_len(1) == 5
    assert a.append_token(1) is None  # within page
    assert a.seq_len(1) == 6


def test_exhaustion_raises(Alloc):
    a = Alloc(2, 4, 8)
    a.allocate(1, 8)
    with pytest.raises(OutOfPages):
        a.allocate(2, 1)


def test_free_returns_pages(Alloc):
    a = Alloc(4, 4, 4)
    pages = a.allocate(1, 16)
    released = a.free(1)
    assert sorted(released) == sorted(pages)
    assert a.num_free_pages == 4
    # All pages reusable
    a.allocate(2, 16)


def test_fork_cow(Alloc):
    a = Alloc(8, 4, 4)
    pages = a.allocate(1, 6)  # 2 pages
    a.fork(1, 2)
    assert a.seq_pages(2) == pages
    # Writing to the shared last page must fork it.
    cow = a.cow_last_page(2)
    assert cow is not None
    src, dst = cow
    assert src == pages[-1]
    assert dst not in pages
    assert a.seq_pages(2)[-1] == dst
    # Parent's page now exclusive again.
    assert a.cow_last_page(1) is None
    # Freeing parent releases only its exclusive pages.
    released = a.free(1)
    assert pages[-1] in released
    assert pages[0] not in released  # still shared with child
    a.free(2)
    assert a.num_free_pages == 8


def test_swap_cycle(Alloc):
    a = Alloc(4, 4, 4)
    a.allocate(1, 10)
    a.allocate(2, 4)
    with pytest.raises(OutOfPages):
        a.allocate(3, 8)
    # Preempt seq 1: release its pages, remember nothing on-device.
    pages = a.release_for_swap(1)
    assert len(pages) == 3
    a.allocate(3, 8)
    a.free(3)
    # Swap back in.
    back = a.allocate_for_swap_in(1, 10)
    assert len(back) == 3
    assert a.seq_len(1) == 10


def test_max_context_enforced(Alloc):
    a = Alloc(32, 4, 2)
    a.allocate(1, 8)  # at the 2-page cap
    with pytest.raises(ValueError):
        a.append_token(1)


def test_reserve_and_advance(Alloc):
    a = Alloc(8, 4, 4)
    a.allocate(1, 6)  # 2 pages, len 6
    new = a.reserve(1, 8)  # cover 14 tokens -> 4 pages, 2 new
    assert len(new) == 2
    assert a.num_free_pages == 4
    a.advance(1, 8)
    assert a.seq_len(1) == 14
    with pytest.raises(ValueError):
        a.advance(1, 4)  # beyond reserved
    # reserve beyond per-seq max
    with pytest.raises(ValueError):
        a.reserve(1, 8)


def test_reserve_out_of_pages(Alloc):
    a = Alloc(3, 4, 8)
    a.allocate(1, 4)
    a.allocate(2, 8)
    with pytest.raises(OutOfPages):
        a.reserve(1, 12)
    # Failed reserve must not leak pages.
    assert a.num_free_pages == 0
    a.free(2)
    assert len(a.reserve(1, 8)) == 2


def test_native_matches_python_fuzz():
    """Randomized op sequence: native and Python must agree exactly."""
    if not native_available():
        pytest.skip("native allocator not built")
    rng = np.random.default_rng(7)
    py = PageAllocator(16, 4, 4)
    nat = NativePageAllocator(16, 4, 4)
    live = []
    next_id = 1
    for _ in range(400):
        op = rng.integers(0, 5)
        try:
            if op == 0:
                sid = next_id
                next_id += 1
                n = int(rng.integers(1, 14))
                r1 = e1 = None
                try:
                    r1 = py.allocate(sid, n)
                except Exception as e:
                    e1 = type(e)
                try:
                    r2 = nat.allocate(sid, n)
                    assert e1 is None and r1 == r2
                    live.append(sid)
                except Exception as e:
                    assert e1 is type(e)
            elif op == 1 and live:
                sid = live[int(rng.integers(0, len(live)))]
                x1 = x2 = e1 = e2 = None
                try:
                    x1 = py.append_token(sid)
                except Exception as e:
                    e1 = type(e)
                try:
                    x2 = nat.append_token(sid)
                except Exception as e:
                    e2 = type(e)
                assert e1 is e2 and x1 == x2
            elif op == 2 and live:
                sid = live.pop(int(rng.integers(0, len(live))))
                assert sorted(py.free(sid)) == sorted(nat.free(sid))
            elif op == 3 and live:
                sid = live[int(rng.integers(0, len(live)))]
                extra = int(rng.integers(1, 6))
                r1 = e1 = None
                try:
                    r1 = py.reserve(sid, extra)
                except Exception as e:
                    e1 = type(e)
                try:
                    r2 = nat.reserve(sid, extra)
                    assert e1 is None and r1 == r2
                except Exception as e:
                    assert e1 is type(e)
            elif op == 4 and live:
                sid = live[int(rng.integers(0, len(live)))]
                assert list(py.padded_table(sid)) == \
                    list(nat.padded_table(sid))
                assert py.seq_len(sid) == nat.seq_len(sid)
        finally:
            assert py.num_free_pages == nat.num_free_pages


def test_run_allocation_contiguous(Alloc):
    """run_pages>1: fresh-pool grants are contiguous aligned runs; the table
    carries granted headroom that decode grows into without new pages."""
    a = Alloc(32, 4, 8, run_pages=4)
    pages = a.allocate(1, 6)  # 2 pages needed -> one 4-page run granted
    assert len(pages) == 4
    assert pages == list(range(pages[0], pages[0] + 4))
    assert pages[0] % 4 == 0
    assert a.num_free_pages == 28
    # Growth within the granted run takes nothing new.
    assert a.reserve(1, 8) == []      # covers 14 tokens -> 4 pages: granted
    a.advance(1, 8)
    # Growth past the run takes another whole run (contiguous again).
    new = a.reserve(1, 8)             # 22 tokens -> 6 pages -> second run
    assert len(new) == 4
    assert new == list(range(new[0], new[0] + 4))
    t = a.padded_table(1)
    assert list(t[:8]) == pages + new


def test_run_allocation_singles_fallback(Alloc):
    """When the free pool can't supply a whole run, run mode degrades to
    EXACT singles — capacity semantics (when OutOfPages fires) identical to
    run_pages=1."""
    a = Alloc(6, 4, 8, run_pages=4)
    a.allocate(1, 16)                 # one aligned run [0..3]
    got = a.allocate(2, 8)            # 2 pages needed, free=2 < run
    assert len(got) == 2              # exact, no padding
    assert a.num_free_pages == 0
    with pytest.raises(OutOfPages):
        a.allocate(3, 4)
    # Freeing the run seq restores run grants.
    a.free(1)
    again = a.allocate(3, 4)          # 1 page needed -> 4-page run granted
    assert len(again) == 4


def test_run_allocation_fork_shares_only_written(Alloc):
    """Fork must not share run-granted headroom: parent and child would
    otherwise write the same physical page at the same logical position."""
    a = Alloc(32, 4, 8, run_pages=4)
    a.allocate(1, 6)                  # table: 4 granted, 2 written (6 tok)
    a.fork(1, 2)
    assert len(a.seq_pages(2)) == 2   # only written pages shared
    cow = a.cow_last_page(2)          # partial last written page -> COW
    assert cow is not None
    src, dst = cow
    assert src == a.seq_pages(1)[1]
    # Parent's decode continues into ITS granted pages; child takes its own.
    a.reserve(1, 8)
    a.reserve(2, 8)
    p1, p2 = a.seq_pages(1), a.seq_pages(2)
    assert set(p1[2:]).isdisjoint(p2), (p1, p2)


def test_native_matches_python_fuzz_runs():
    """Randomized parity with run-granular allocation enabled."""
    if not native_available():
        pytest.skip("native allocator not built")
    rng = np.random.default_rng(23)
    py = PageAllocator(32, 4, 8, run_pages=4)
    nat = NativePageAllocator(32, 4, 8, run_pages=4)
    live, next_id = [], 1
    for _ in range(500):
        op = rng.integers(0, 5)
        if op == 0:
            sid, next_id = next_id, next_id + 1
            n = int(rng.integers(1, 30))
            r1 = e1 = None
            try:
                r1 = py.allocate(sid, n)
            except Exception as e:
                e1 = type(e)
            try:
                r2 = nat.allocate(sid, n)
                assert e1 is None and r1 == r2
                live.append(sid)
            except Exception as e:
                assert e1 is type(e)
        elif op == 1 and live:
            sid = live[int(rng.integers(0, len(live)))]
            extra = int(rng.integers(1, 9))
            r1 = e1 = None
            try:
                r1 = py.reserve(sid, extra)
            except Exception as e:
                e1 = type(e)
            try:
                r2 = nat.reserve(sid, extra)
                assert e1 is None and r1 == r2
            except Exception as e:
                assert e1 is type(e)
        elif op == 2 and live:
            sid = live.pop(int(rng.integers(0, len(live))))
            assert sorted(py.free(sid)) == sorted(nat.free(sid))
        elif op == 3 and live:
            sid = live[int(rng.integers(0, len(live)))]
            par = live[int(rng.integers(0, len(live)))]
            if par != sid:
                continue
            cid, next_id = next_id, next_id + 1
            e1 = None
            try:
                py.fork(sid, cid)
            except Exception as e:
                e1 = type(e)
            forked = False
            try:
                nat.fork(sid, cid)
                assert e1 is None
                live.append(cid)
                forked = True
            except Exception as e:
                assert e1 is type(e)
            if forked:
                c1 = ce1 = None
                try:
                    c1 = py.cow_last_page(cid)
                except Exception as e:
                    ce1 = type(e)
                try:
                    c2 = nat.cow_last_page(cid)
                    assert ce1 is None and c1 == c2
                except Exception as e:
                    assert ce1 is type(e)
        elif op == 4 and live:
            sid = live[int(rng.integers(0, len(live)))]
            assert list(py.padded_table(sid)) == list(nat.padded_table(sid))
            assert py.seq_len(sid) == nat.seq_len(sid)
        assert py.num_free_pages == nat.num_free_pages


def test_convert_pool_roundtrip():
    """convert_fp8 analog: float -> int8 -> float roundtrip within scale
    error; fp8 target produces fp8 payload + scales."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vllmini_tpu.config import CacheConfig, ModelConfig
    from vllmini_tpu.memory.kv_cache import convert_pool, create_kv_pool

    cfg = ModelConfig(family="gpt2", vocab_size=64, hidden_size=32,
                      num_layers=2, num_heads=2, max_position_embeddings=32,
                      dtype="float32")
    cache = CacheConfig(num_pages=4, page_size=4, max_pages_per_seq=2,
                        kv_dtype="float32", head_pad_to=1)
    pool = create_kv_pool(cfg, cache)
    key = jax.random.PRNGKey(0)
    used = pool.num_kv_heads * pool.head_dim  # row-tail pad lanes stay zero

    def fill(k, shape):
        x = jax.random.normal(k, shape)
        return x.at[..., used:].set(0.0)

    pool.kv_pages[0] = fill(key, pool.kv_pages[0].shape)

    q = convert_pool(pool, jnp.int8)
    assert q.quantized and q.kv_pages[0].dtype == jnp.int8
    back = convert_pool(q, jnp.float32)
    assert not back.quantized
    np.testing.assert_allclose(np.asarray(back.kv_pages[0]),
                               np.asarray(pool.kv_pages[0]), atol=2e-2)

    f8 = convert_pool(pool, jnp.float8_e4m3fn)
    assert f8.kv_pages[0].dtype == jnp.float8_e4m3fn
    back8 = convert_pool(f8, jnp.float32)
    # e4m3: 3 mantissa bits -> up to ~6% relative spacing near amax.
    np.testing.assert_allclose(np.asarray(back8.kv_pages[0]),
                               np.asarray(pool.kv_pages[0]), atol=2e-1)


def test_native_matches_python_fuzz_windowed_and_shared():
    """Randomized parity incl. the windowed ring and prefix-cache sharing
    ops (ref/unref/adopt) — the round-2 surface."""
    if not native_available():
        pytest.skip("native allocator not built")
    rng = np.random.default_rng(11)
    py = PageAllocator(24, 4, 12, window_pages=3)
    nat = NativePageAllocator(24, 4, 12, window_pages=3)
    live, next_id = [], 1
    for _ in range(500):
        op = rng.integers(0, 6)
        if op == 0:
            sid, next_id = next_id, next_id + 1
            n = int(rng.integers(1, 40))
            r1 = e1 = None
            try:
                r1 = py.allocate(sid, n)
            except Exception as e:
                e1 = type(e)
            try:
                r2 = nat.allocate(sid, n)
                assert e1 is None and r1 == r2
                live.append(sid)
            except Exception as e:
                assert e1 is type(e)
        elif op == 1 and live:
            sid = live[int(rng.integers(0, len(live)))]
            x1 = x2 = e1 = e2 = None
            try:
                x1 = py.append_token(sid)
            except Exception as e:
                e1 = type(e)
            try:
                x2 = nat.append_token(sid)
            except Exception as e:
                e2 = type(e)
            assert e1 is e2 and x1 == x2
        elif op == 2 and live:
            sid = live.pop(int(rng.integers(0, len(live))))
            assert sorted(py.free(sid)) == sorted(nat.free(sid))
        elif op == 3 and live:
            sid = live[int(rng.integers(0, len(live)))]
            extra = int(rng.integers(1, 9))
            r1 = e1 = None
            try:
                r1 = py.reserve(sid, extra)
            except Exception as e:
                e1 = type(e)
            try:
                r2 = nat.reserve(sid, extra)
                assert e1 is None and r1 == r2
            except Exception as e:
                assert e1 is type(e)
        elif op == 4 and live:
            sid = live[int(rng.integers(0, len(live)))]
            assert list(py.padded_table(sid)) == list(nat.padded_table(sid))
            assert py.seq_len(sid) == nat.seq_len(sid)
        elif op == 5 and live:
            # adopt a prefix of a live seq's pages into a new seq
            src = live[int(rng.integers(0, len(live)))]
            pages = py.seq_pages(src)
            k = int(rng.integers(1, max(2, len(set(pages[:3])) + 1)))
            head = pages[:k]
            if len(set(head)) != len(head):
                continue
            sid, next_id = next_id, next_id + 1
            py.adopt(sid, head, k * 4)
            nat.adopt(sid, head, k * 4)
            live.append(sid)
        assert py.num_free_pages == nat.num_free_pages
    # deterministic reserve parity pass
    for sid in list(live):
        e1 = r1 = None
        try:
            r1 = py.reserve(sid, 6)
        except Exception as e:
            e1 = type(e)
        try:
            r2 = nat.reserve(sid, 6)
            assert e1 is None and r1 == r2
        except Exception as e:
            assert e1 is type(e)
        assert py.num_free_pages == nat.num_free_pages
