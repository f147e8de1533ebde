// Native paged-KV allocator: the host-side hot path of continuous batching.
//
// The engine's scheduler allocates/frees KV pages every admission and every
// completion; at production batch sizes this is a per-step host cost that
// must not touch Python object machinery.  C ABI so both the Python engine
// (ctypes) and any embedder can drive it.
//
// Semantics: fixed pool of `num_pages` pages; page 0 is reserved (null page).
// Sequences acquire pages one at a time as they grow (append path) or in
// bulk (prefill path).  Free is O(pages-of-sequence).  A simple free-list
// keeps allocation O(1); fragmentation is structurally impossible because
// pages are uniform.

#include <cstdint>
#include <cstring>
#include <mutex>
#include <new>
#include <vector>

extern "C" {

typedef struct fatpu_page_pool fatpu_page_pool;

struct fatpu_page_pool {
  std::vector<int32_t> free_list;   // LIFO of free page ids
  std::vector<int32_t> owner;       // page id -> sequence slot (-1 = free)
  std::mutex mu;
  int32_t num_pages;
};

fatpu_page_pool* fatpu_pool_create(int32_t num_pages) {
  if (num_pages < 2) return nullptr;
  auto* pool = new (std::nothrow) fatpu_page_pool();
  if (!pool) return nullptr;
  pool->num_pages = num_pages;
  pool->owner.assign(num_pages, -1);
  pool->free_list.reserve(num_pages - 1);
  // LIFO init in reverse so the first allocations are low page ids (helps
  // locality of the device-side gather).
  for (int32_t p = num_pages - 1; p >= 1; --p) pool->free_list.push_back(p);
  return pool;
}

void fatpu_pool_destroy(fatpu_page_pool* pool) { delete pool; }

int32_t fatpu_pool_free_count(fatpu_page_pool* pool) {
  std::lock_guard<std::mutex> lock(pool->mu);
  return static_cast<int32_t>(pool->free_list.size());
}

// Acquire `n` pages for sequence `slot`; writes page ids into out[0..n).
// Returns n on success, -1 if the pool cannot satisfy the request (caller
// should defer admission — no partial allocation happens).
int32_t fatpu_pool_acquire(fatpu_page_pool* pool, int32_t slot, int32_t n,
                           int32_t* out) {
  std::lock_guard<std::mutex> lock(pool->mu);
  if (static_cast<int32_t>(pool->free_list.size()) < n) return -1;
  for (int32_t i = 0; i < n; ++i) {
    int32_t p = pool->free_list.back();
    pool->free_list.pop_back();
    pool->owner[p] = slot;
    out[i] = p;
  }
  return n;
}

// Release every page owned by `slot`. Returns the number released.
int32_t fatpu_pool_release_slot(fatpu_page_pool* pool, int32_t slot) {
  std::lock_guard<std::mutex> lock(pool->mu);
  int32_t released = 0;
  for (int32_t p = 1; p < pool->num_pages; ++p) {
    if (pool->owner[p] == slot) {
      pool->owner[p] = -1;
      pool->free_list.push_back(p);
      ++released;
    }
  }
  return released;
}

int32_t fatpu_pool_owner(fatpu_page_pool* pool, int32_t page) {
  std::lock_guard<std::mutex> lock(pool->mu);
  if (page < 0 || page >= pool->num_pages) return -2;
  return pool->owner[page];
}

// Transfer ownership of specific pages to `new_slot` (prefix-cache support:
// a request's fully-written prompt pages are donated to the cache's pseudo-
// slot so release_slot(request) leaves them resident).  Returns the number
// transferred; pages that are free or out of range are skipped.
int32_t fatpu_pool_transfer(fatpu_page_pool* pool, const int32_t* pages,
                            int32_t n, int32_t new_slot) {
  std::lock_guard<std::mutex> lock(pool->mu);
  int32_t moved = 0;
  for (int32_t i = 0; i < n; ++i) {
    int32_t p = pages[i];
    if (p < 1 || p >= pool->num_pages || pool->owner[p] < 0) continue;
    pool->owner[p] = new_slot;
    ++moved;
  }
  return moved;
}

// Release specific pages back to the free list regardless of owner (prefix-
// cache eviction).  Returns the number released; free/out-of-range pages
// are skipped (idempotent).
int32_t fatpu_pool_release_pages(fatpu_page_pool* pool, const int32_t* pages,
                                 int32_t n) {
  std::lock_guard<std::mutex> lock(pool->mu);
  int32_t released = 0;
  for (int32_t i = 0; i < n; ++i) {
    int32_t p = pages[i];
    if (p < 1 || p >= pool->num_pages || pool->owner[p] < 0) continue;
    pool->owner[p] = -1;
    pool->free_list.push_back(p);
    ++released;
  }
  return released;
}

}  // extern "C"
