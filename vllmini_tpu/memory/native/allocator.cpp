// Native page allocator for the paged KV cache.
//
// C++ twin of the Python PageAllocator in ../allocator.py (which is the
// behavioral spec; the shared test suite runs against both). The reference
// implements this layer in Python over CUDA tensors
// (/root/reference/vllmini/kv_cache.py free list, block_manager.py tables);
// here the runtime half is native: the scheduler calls into this on every
// chunk (reserve/advance for every running slot) and at admission, so the
// host-side cost stays flat as slot counts and pools grow to production sizes
// (hundreds of slots x 100k+ pages, multi-host schedulers).
//
// Exposed via a C ABI consumed with ctypes (no pybind11 in this image).
// Error codes: -1 = no page / none, -2 = out of pages, -3 = exceeds per-seq
// max, -4 = unknown/duplicate sequence.

#include <algorithm>
#include <cstdint>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Seq {
  std::vector<int32_t> pages;  // logical order
  int64_t length = 0;          // committed tokens
};

struct Allocator {
  int32_t num_pages;
  int32_t page_size;
  int32_t pages_per_seq_max;
  int32_t window_pages;  // 0 = no sliding-window ring
  int32_t run_pages;     // >1: grant contiguous runs (see ../allocator.py)
  std::vector<int32_t> free_list;   // back = next to hand out
  std::vector<int32_t> refcount;
  std::unordered_map<int64_t, Seq> seqs;

  Allocator(int32_t np, int32_t ps, int32_t ppsm, int32_t wp, int32_t rp)
      : num_pages(np), page_size(ps), pages_per_seq_max(ppsm),
        window_pages(wp), run_pages(wp > 0 || rp < 1 ? 1 : rp),
        refcount(np, 0) {
    free_list.reserve(np);
    for (int32_t i = np - 1; i >= 0; --i) free_list.push_back(i);
  }

  int64_t pages_needed(int64_t tokens) const {
    return (tokens + page_size - 1) / page_size;
  }

  int64_t phys_pages_needed(int64_t tokens) const {
    int64_t n = pages_needed(tokens);
    if (window_pages > 0 && n > window_pages) n = window_pages;
    return n;
  }

  int32_t take_page() {
    int32_t p = free_list.back();
    free_list.pop_back();
    refcount[p] = 1;
    return p;
  }

  // Pop a contiguous free run of run_pages into *out (preferring a
  // run-aligned base, same preference as the Python spec). False when the
  // free pool has no such span.
  bool take_run(std::vector<int32_t>* out) {
    const int32_t run = run_pages;
    if (run <= 1 || static_cast<int32_t>(free_list.size()) < run)
      return false;
    std::vector<int32_t> fs(free_list);
    std::sort(fs.begin(), fs.end());
    int32_t base = -1;
    for (size_t j = 0; j + run <= fs.size() + 0u; ++j) {
      if (fs[j + run - 1] == fs[j] + run - 1) {
        if (fs[j] % run == 0) { base = fs[j]; break; }
        if (base < 0) base = fs[j];
      }
    }
    if (base < 0) return false;
    std::vector<int32_t> kept;
    kept.reserve(free_list.size() - run);
    for (int32_t p : free_list)
      if (p < base || p >= base + run) kept.push_back(p);
    free_list.swap(kept);
    for (int32_t p = base; p < base + run; ++p) {
      refcount[p] = 1;
      out->push_back(p);
    }
    return true;
  }

  // Sliding-window ring reuse: the page `window_pages` logical slots back
  // is entirely below the attention window by the time the next slot is
  // written — reuse it unless it is COW/prefix-shared.
  int32_t recycle_or_none(const Seq& s) const {
    if (window_pages <= 0) return -1;
    int64_t j = static_cast<int64_t>(s.pages.size());
    if (j < window_pages) return -1;
    int32_t cand = s.pages[j - window_pages];
    if (refcount[cand] != 1) return -1;
    return cand;
  }
};

}  // namespace

extern "C" {

void* pa_create(int32_t num_pages, int32_t page_size,
                int32_t pages_per_seq_max, int32_t window_pages,
                int32_t run_pages) {
  return new Allocator(num_pages, page_size, pages_per_seq_max,
                       window_pages, run_pages);
}

void pa_destroy(void* h) { delete static_cast<Allocator*>(h); }

int32_t pa_num_free(void* h) {
  return static_cast<int32_t>(static_cast<Allocator*>(h)->free_list.size());
}

int32_t pa_can_allocate(void* h, int64_t num_tokens) {
  auto* a = static_cast<Allocator*>(h);
  return a->phys_pages_needed(num_tokens) <=
         static_cast<int64_t>(a->free_list.size());
}

int32_t pa_has_seq(void* h, int64_t seq_id) {
  auto* a = static_cast<Allocator*>(h);
  return a->seqs.count(seq_id) ? 1 : 0;
}

int64_t pa_seq_len(void* h, int64_t seq_id) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->seqs.find(seq_id);
  if (it == a->seqs.end()) return -4;
  return it->second.length;
}

int32_t pa_num_seq_pages(void* h, int64_t seq_id) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->seqs.find(seq_id);
  if (it == a->seqs.end()) return -4;
  return static_cast<int32_t>(it->second.pages.size());
}

// out_pages must hold pages_per_seq_max entries. Returns #pages or error.
int32_t pa_allocate(void* h, int64_t seq_id, int64_t num_tokens,
                    int32_t* out_pages) {
  auto* a = static_cast<Allocator*>(h);
  if (a->seqs.count(seq_id)) return -4;
  int64_t tokens = num_tokens < 1 ? 1 : num_tokens;
  int64_t n = a->pages_needed(tokens);
  if (n > a->pages_per_seq_max) return -3;
  int64_t phys = a->phys_pages_needed(tokens);
  if (phys > static_cast<int64_t>(a->free_list.size())) return -2;
  Seq s;
  std::vector<int32_t> owned;
  if (a->run_pages > 1) {
    // Whole runs while they fit under the per-seq cap, then exact singles
    // (capacity was checked above, so singles cannot run dry).
    const int64_t run = a->run_pages;
    int64_t total = ((n + run - 1) / run) * run;
    if (total > a->pages_per_seq_max) total = a->pages_per_seq_max;
    while (static_cast<int64_t>(owned.size()) + run <= total)
      if (!a->take_run(&owned)) break;
    while (static_cast<int64_t>(owned.size()) < n)
      owned.push_back(a->take_page());
  } else {
    for (int64_t i = 0; i < phys; ++i) owned.push_back(a->take_page());
  }
  if (static_cast<int64_t>(owned.size()) > phys) {
    // Run mode: every granted page stays in the table (reserve-style
    // headroom that decode grows into).
    s.pages = owned;
    for (size_t j = 0; j < owned.size() && out_pages; ++j)
      out_pages[j] = owned[j];
  } else {
    // Windowed: logical slot j maps to ring slot j mod phys (the same
    // pattern append-time recycling produces).
    for (int64_t j = 0; j < n; ++j) {
      int32_t p = owned[j % phys];
      s.pages.push_back(p);
      if (out_pages) out_pages[j] = p;
    }
  }
  int32_t count = static_cast<int32_t>(s.pages.size());
  s.length = num_tokens;
  a->seqs.emplace(seq_id, std::move(s));
  return count;
}

// Reserve page coverage for length+extra tokens. Returns #new pages or error.
int32_t pa_reserve(void* h, int64_t seq_id, int64_t extra,
                   int32_t* out_new_pages) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->seqs.find(seq_id);
  if (it == a->seqs.end()) return -4;
  Seq& s = it->second;
  int64_t needed = a->pages_needed(s.length + extra);
  if (needed > a->pages_per_seq_max) return -3;
  int64_t missing = needed - static_cast<int64_t>(s.pages.size());
  if (missing <= 0) return 0;
  int32_t added = 0;
  while (static_cast<int64_t>(s.pages.size()) < needed) {
    int32_t p = a->recycle_or_none(s);
    if (p < 0) {
      if (a->run_pages > 1 &&
          static_cast<int64_t>(s.pages.size()) + a->run_pages <=
              a->pages_per_seq_max) {
        std::vector<int32_t> r;
        if (a->take_run(&r)) {
          for (int32_t q : r) {
            if (out_new_pages) out_new_pages[added] = q;
            ++added;
            s.pages.push_back(q);
          }
          continue;
        }
      }
      if (a->free_list.empty()) return -2;
      p = a->take_page();
      if (out_new_pages) out_new_pages[added] = p;
      ++added;
    }
    s.pages.push_back(p);
  }
  return added;
}

int32_t pa_advance(void* h, int64_t seq_id, int64_t n_tokens) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->seqs.find(seq_id);
  if (it == a->seqs.end()) return -4;
  Seq& s = it->second;
  int64_t new_len = s.length + n_tokens;
  if (new_len > static_cast<int64_t>(s.pages.size()) * a->page_size)
    return -3;
  s.length = new_len;
  return 0;
}

// Returns new page index, -1 if no new page needed, or error code.
int32_t pa_append_token(void* h, int64_t seq_id) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->seqs.find(seq_id);
  if (it == a->seqs.end()) return -4;
  Seq& s = it->second;
  int32_t result = -1;
  if (s.length == static_cast<int64_t>(s.pages.size()) * a->page_size) {
    if (static_cast<int32_t>(s.pages.size()) >= a->pages_per_seq_max)
      return -3;
    int32_t recycled = a->recycle_or_none(s);
    if (recycled >= 0) {
      s.pages.push_back(recycled);
    } else {
      if (a->free_list.empty()) return -2;
      result = a->take_page();
      s.pages.push_back(result);
    }
  }
  s.length += 1;
  return result;
}

// out_released must hold pages_per_seq_max entries. Returns #released.
int32_t pa_free_seq(void* h, int64_t seq_id, int32_t* out_released) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->seqs.find(seq_id);
  if (it == a->seqs.end()) return -4;
  int32_t released = 0;
  std::unordered_set<int32_t> seen;  // windowed tables repeat pages
  for (int32_t p : it->second.pages) {
    if (!seen.insert(p).second) continue;
    if (--a->refcount[p] == 0) {
      a->free_list.push_back(p);
      if (out_released) out_released[released] = p;
      ++released;
    }
  }
  a->seqs.erase(it);
  return released;
}

int32_t pa_fork(void* h, int64_t parent, int64_t child) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->seqs.find(parent);
  if (it == a->seqs.end() || a->seqs.count(child)) return -4;
  Seq c;
  // Share only pages that HOLD tokens: run-granted headroom beyond the
  // written length belongs to the parent alone (see ../allocator.py).
  if (a->window_pages <= 0) {
    int64_t len = it->second.length < 1 ? 1 : it->second.length;
    size_t written = static_cast<size_t>(a->pages_needed(len));
    if (written > it->second.pages.size())
      written = it->second.pages.size();
    c.pages.assign(it->second.pages.begin(),
                   it->second.pages.begin() + written);
  } else {
    c.pages = it->second.pages;
  }
  c.length = it->second.length;
  std::unordered_set<int32_t> seen;
  for (int32_t p : c.pages)
    if (seen.insert(p).second) ++a->refcount[p];
  a->seqs.emplace(child, std::move(c));
  return 0;
}

// src_dst[0]=src, src_dst[1]=dst on copy; returns 1 if COW happened, 0 if the
// page was exclusive, or error.
int32_t pa_cow_last(void* h, int64_t seq_id, int32_t* src_dst) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->seqs.find(seq_id);
  if (it == a->seqs.end()) return -4;
  Seq& s = it->second;
  // The page holding the last WRITTEN token (run-granted tables may extend
  // past it; pages.back() would be unwritten headroom).
  int64_t len = s.length < 1 ? 1 : s.length;
  size_t idx = static_cast<size_t>((len - 1) / a->page_size);
  if (idx >= s.pages.size()) idx = s.pages.size() - 1;
  int32_t last = s.pages[idx];
  if (a->refcount[last] == 1) return 0;
  if (a->free_list.empty()) return -2;
  int32_t dst = a->take_page();
  --a->refcount[last];
  s.pages[idx] = dst;
  src_dst[0] = last;
  src_dst[1] = dst;
  return 1;
}

// Fill out[pages_per_seq_max] with page indices, padded with num_pages.
int32_t pa_padded_table(void* h, int64_t seq_id, int32_t* out) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->seqs.find(seq_id);
  if (it == a->seqs.end()) return -4;
  const Seq& s = it->second;
  int32_t i = 0;
  for (; i < static_cast<int32_t>(s.pages.size()); ++i) out[i] = s.pages[i];
  for (; i < a->pages_per_seq_max; ++i) out[i] = a->num_pages;
  return static_cast<int32_t>(s.pages.size());
}

// Copy the seq's pages (logical order) into out, then drop the sequence.
int32_t pa_release_for_swap(void* h, int64_t seq_id, int32_t* out_pages) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->seqs.find(seq_id);
  if (it == a->seqs.end()) return -4;
  int32_t n = static_cast<int32_t>(it->second.pages.size());
  std::unordered_set<int32_t> seen;
  for (int32_t i = 0; i < n; ++i) {
    int32_t p = it->second.pages[i];
    if (out_pages) out_pages[i] = p;
    if (seen.insert(p).second && --a->refcount[p] == 0)
      a->free_list.push_back(p);
  }
  a->seqs.erase(it);
  return n;
}

// ------------------------------------------------- prefix-cache sharing

int32_t pa_ref_page(void* h, int32_t page) {
  auto* a = static_cast<Allocator*>(h);
  if (page < 0 || page >= a->num_pages || a->refcount[page] < 1) return -4;
  ++a->refcount[page];
  return 0;
}

int32_t pa_unref_page(void* h, int32_t page) {
  auto* a = static_cast<Allocator*>(h);
  if (page < 0 || page >= a->num_pages || a->refcount[page] < 1) return -4;
  if (--a->refcount[page] == 0) a->free_list.push_back(page);
  return 0;
}

// Start a sequence on EXISTING pages (prefix-cache hit); num_tokens must be
// page-aligned (n_pages * page_size).
int32_t pa_adopt(void* h, int64_t seq_id, const int32_t* pages,
                 int32_t n_pages, int64_t num_tokens) {
  auto* a = static_cast<Allocator*>(h);
  if (a->seqs.count(seq_id)) return -4;
  if (num_tokens != static_cast<int64_t>(n_pages) * a->page_size) return -3;
  Seq s;
  for (int32_t i = 0; i < n_pages; ++i) {
    int32_t p = pages[i];
    if (p < 0 || p >= a->num_pages || a->refcount[p] < 1) return -4;
    s.pages.push_back(p);
  }
  for (int32_t p : s.pages) ++a->refcount[p];
  s.length = num_tokens;
  a->seqs.emplace(seq_id, std::move(s));
  return 0;
}

}  // extern "C"
