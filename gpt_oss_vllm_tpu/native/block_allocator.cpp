// block_allocator — native KV-cache block manager with prefix-sharing
// (radix) reuse, the C++ runtime counterpart of vLLM's block manager
// (SURVEY.md §2.3 row 5). Exposed via a C ABI consumed by ctypes
// (gpt_oss_vllm_tpu/native/__init__.py); the Python BlockAllocator remains
// as the dependency-free fallback.
//
// Design:
// - free list with O(1) alloc/free
// - per-block refcounts so identical prompt prefixes can share KV blocks
//   (copy-on-write is unnecessary for inference: shared blocks are
//   read-only by construction; a sequence's first divergent block is
//   always freshly allocated)
// - a hash-trie over (parent_block, token_chunk_hash) for prefix lookup
//
// Build: native/build.sh -> libblockalloc.so

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Allocator {
  int64_t num_blocks;
  std::vector<int32_t> free_list;
  std::vector<int32_t> refcount;
  // prefix cache: key = (parent_block << 32) | chunk_hash_low, value = block
  std::unordered_map<uint64_t, int32_t> prefix_map;
  std::vector<uint64_t> block_key;  // reverse map for eviction
  int64_t hits = 0, misses = 0;
};

uint64_t make_key(int32_t parent, uint32_t h) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(parent + 1)) << 32) | h;
}

uint32_t fnv1a(const int32_t* tokens, int n) {
  uint32_t h = 2166136261u;
  for (int i = 0; i < n; ++i) {
    uint32_t v = static_cast<uint32_t>(tokens[i]);
    for (int b = 0; b < 4; ++b) {
      h ^= (v >> (8 * b)) & 0xFF;
      h *= 16777619u;
    }
  }
  return h;
}

}  // namespace

extern "C" {

void* ba_create(int64_t num_blocks) {
  auto* a = new Allocator();
  a->num_blocks = num_blocks;
  a->refcount.assign(num_blocks, 0);
  a->block_key.assign(num_blocks, 0);
  a->free_list.reserve(num_blocks);
  for (int64_t i = num_blocks - 1; i >= 0; --i)
    a->free_list.push_back(static_cast<int32_t>(i));
  return a;
}

void ba_destroy(void* p) { delete static_cast<Allocator*>(p); }

int64_t ba_num_free(void* p) {
  return static_cast<Allocator*>(p)->free_list.size();
}

// Allocate n fresh blocks into out[n]; returns 0 on success, -1 if exhausted.
int ba_allocate(void* p, int64_t n, int32_t* out) {
  auto* a = static_cast<Allocator*>(p);
  if (static_cast<int64_t>(a->free_list.size()) < n) return -1;
  for (int64_t i = 0; i < n; ++i) {
    int32_t b = a->free_list.back();
    a->free_list.pop_back();
    a->refcount[b] = 1;
    a->block_key[b] = 0;
    out[i] = b;
  }
  return 0;
}

// Decrement refcounts; blocks reaching zero return to the free list (their
// prefix entries stay until evicted by reuse-miss pressure).
void ba_release(void* p, const int32_t* blocks, int64_t n) {
  auto* a = static_cast<Allocator*>(p);
  for (int64_t i = 0; i < n; ++i) {
    int32_t b = blocks[i];
    if (b < 0 || b >= a->num_blocks || a->refcount[b] <= 0) continue;
    if (--a->refcount[b] == 0) {
      // keep the prefix mapping: the block's contents remain valid until
      // the block is reallocated (ba_allocate clears block_key)
      a->free_list.push_back(b);
    }
  }
}

// Prefix lookup-or-claim for one full block of tokens.
// parent: previous block in the chain (-1 for the first block).
// On hit: increments refcount, removes the block from the free list if it
// was there, writes the block id, returns 1.
// On miss: returns 0 (caller allocates fresh and calls ba_register).
int ba_prefix_lookup(void* p, int32_t parent, const int32_t* tokens, int n,
                     int32_t* out_block) {
  auto* a = static_cast<Allocator*>(p);
  uint64_t key = make_key(parent, fnv1a(tokens, n));
  auto it = a->prefix_map.find(key);
  if (it == a->prefix_map.end()) {
    a->misses++;
    return 0;
  }
  int32_t b = it->second;
  // stale entry: block was reallocated to other content
  if (a->block_key[b] != key) {
    a->prefix_map.erase(it);
    a->misses++;
    return 0;
  }
  if (a->refcount[b] == 0) {
    // resurrect from the free list
    for (size_t i = 0; i < a->free_list.size(); ++i) {
      if (a->free_list[i] == b) {
        a->free_list[i] = a->free_list.back();
        a->free_list.pop_back();
        break;
      }
    }
  }
  a->refcount[b]++;
  a->hits++;
  *out_block = b;
  return 1;
}

// Register a freshly-filled block in the prefix cache.
void ba_register(void* p, int32_t parent, const int32_t* tokens, int n,
                 int32_t block) {
  auto* a = static_cast<Allocator*>(p);
  uint64_t key = make_key(parent, fnv1a(tokens, n));
  a->prefix_map[key] = block;
  a->block_key[block] = key;
}

void ba_stats(void* p, int64_t* hits, int64_t* misses) {
  auto* a = static_cast<Allocator*>(p);
  *hits = a->hits;
  *misses = a->misses;
}

int ba_abi_version() { return 1; }

}  // extern "C"
