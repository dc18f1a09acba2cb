"""PageAllocator property tests (no accelerator needed)."""

import numpy as np
import pytest

from vllmini_tpu.memory.allocator import OutOfPages, PageAllocator


def test_allocate_and_padded_table():
    a = PageAllocator(num_pages=10, page_size=4, pages_per_seq_max=4)
    pages = a.allocate(1, num_tokens=9)  # 3 pages
    assert len(pages) == 3
    assert a.num_free_pages == 7
    t = a.padded_table(1)
    assert t.shape == (4,)
    assert list(t[:3]) == pages
    assert t[3] == 10  # OOB sentinel


def test_no_double_allocation():
    a = PageAllocator(8, 4, 4)
    p1 = a.allocate(1, 8)
    p2 = a.allocate(2, 8)
    assert set(p1).isdisjoint(p2)
    with pytest.raises(ValueError):
        a.allocate(1, 4)


def test_append_token_page_boundary():
    a = PageAllocator(8, 4, 4)
    a.allocate(1, 4)  # exactly one full page
    assert a.seq_len(1) == 4
    new = a.append_token(1)  # boundary -> new page
    assert new is not None
    assert a.seq_len(1) == 5
    assert a.append_token(1) is None  # within page
    assert a.seq_len(1) == 6


def test_exhaustion_raises():
    a = PageAllocator(2, 4, 8)
    a.allocate(1, 8)
    with pytest.raises(OutOfPages):
        a.allocate(2, 1)


def test_free_returns_pages():
    a = PageAllocator(4, 4, 4)
    pages = a.allocate(1, 16)
    released = a.free(1)
    assert sorted(released) == sorted(pages)
    assert a.num_free_pages == 4
    # All pages reusable
    a.allocate(2, 16)


def test_fork_cow():
    a = PageAllocator(8, 4, 4)
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


def test_swap_cycle():
    a = PageAllocator(4, 4, 4)
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


def test_max_context_enforced():
    a = PageAllocator(32, 4, 2)
    a.allocate(1, 8)  # at the 2-page cap
    with pytest.raises(ValueError):
        a.append_token(1)
