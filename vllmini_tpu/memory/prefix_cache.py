"""Automatic prefix caching: reuse KV pages across requests sharing a prompt
prefix.

The reference has nothing like this (its `copy_blocks` COW kernel is the
closest unused machinery); here it composes three things this framework
already has:

- the refcounted page allocator: a cached page is just a page the cache
  holds one reference on (`ref_page`), shared copy-on-write-style with any
  sequence that adopts it (`adopt`). Cached pages are READ-ONLY by
  construction — adoption is page-aligned, so a sequence's first write
  always lands on a fresh page;
- chunked prefill: an admitted prompt with `cached` tokens of reusable
  prefix simply starts its prefill at `start_pos=cached` (the chunk attends
  over the pool-resident prefix exactly as a mid-prompt chunk would);
- one page table per sequence across all layers: a single host-side map
  serves the whole model.

Keys are running hashes of the token prefix up to each page boundary, so a
lookup walks the prompt page by page while hits continue. Eviction is LRU
over entries whose pages the allocator needs back (an entry's page may still
be referenced by live sequences; eviction merely drops the CACHE's
reference).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple


def _block_keys(prompt: Sequence[int], page_size: int, n_blocks: int):
    """Running-prefix keys for the first n_blocks pages of the prompt."""
    keys = []
    h = 0
    for b in range(n_blocks):
        block = tuple(prompt[b * page_size:(b + 1) * page_size])
        h = hash((h, block))
        keys.append(h)
    return keys


class PrefixCache:
    """LRU map: prefix-hash -> physical page holding that page of KV."""

    def __init__(self, allocator, max_entries: int = 4096):
        self.allocator = allocator
        self.max_entries = max_entries
        self._entries: "OrderedDict[int, int]" = OrderedDict()  # key -> page
        self.hits = 0
        self.hit_tokens = 0
        self.inserts = 0

    def __len__(self) -> int:
        return len(self._entries)

    def lookup(self, prompt: Sequence[int], max_tokens: int,
               peek: bool = False) -> Tuple[int, List[int]]:
        """Longest cached page-aligned prefix of `prompt` (capped at
        `max_tokens`, which the caller sets so at least one token remains to
        prefill). Returns (cached_tokens, pages).

        `peek=True` is a side-effect-free probe (no LRU touch, no stats) —
        `burst_eligible` uses it, so an admission does not count a hit
        twice (once for the eligibility check, once for the real adopt)."""
        ps = self.allocator.page_size
        n = min(len(prompt), max_tokens) // ps
        pages: List[int] = []
        for key in _block_keys(prompt, ps, n):
            page = self._entries.get(key)
            if page is None:
                break
            if not peek:
                self._entries.move_to_end(key)
            pages.append(page)
        if pages and not peek:
            self.hits += 1
            self.hit_tokens += len(pages) * ps
        return len(pages) * ps, pages

    def insert(self, prompt: Sequence[int], pages: Sequence[int]) -> None:
        """Publish a freshly prefilled prompt's full pages (the cache takes
        one reference on each newly published page)."""
        ps = self.allocator.page_size
        n = min(len(prompt) // ps, len(pages))
        for key, page in zip(_block_keys(prompt, ps, n), pages[:n]):
            if key in self._entries:
                self._entries.move_to_end(key)
                continue
            self.allocator.ref_page(page)
            self._entries[key] = page
            self.inserts += 1
        while len(self._entries) > self.max_entries:
            self._evict_oldest()

    def _evict_oldest(self) -> None:
        _, page = self._entries.popitem(last=False)
        self.allocator.unref_page(page)

    def evict_for(self, pages_needed: int) -> None:
        """Drop LRU entries until the allocator could satisfy
        `pages_needed` (or the cache is empty). Entries still referenced by
        live sequences release only the cache's share."""
        while (self._entries
               and self.allocator.num_free_pages < pages_needed):
            self._evict_oldest()

    def clear(self) -> None:
        while self._entries:
            self._evict_oldest()
