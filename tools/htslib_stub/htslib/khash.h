/* Compile-only khash-compatible shim backed by std::unordered_map.
 *
 * Purpose: let the reference pindel (used ONLY as a golden-output test
 * oracle for pindel-format inputs) compile without htslib.  The API shape
 * follows the public khash macro interface; the implementation is our own.
 * The BAM code paths that use it are never exercised by the oracle runs
 * (they require .bam inputs we do not use), but the map is functional
 * anyway.
 */
#ifndef PINDEL_TPU_KHASH_STUB_H
#define PINDEL_TPU_KHASH_STUB_H

#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

typedef unsigned int khint_t;
typedef khint_t khiter_t;

/* Iteration order: we keep insertion order in a side vector so that
 * kh_begin..kh_end indexing works like khash's slot scan. */

#define KHASH_MAP_INIT_STR(name, khval_t)                                   \
  struct kh_##name##_t {                                                    \
    std::unordered_map<std::string, khint_t> idx;                           \
    std::vector<const char *> keys;                                         \
    std::vector<khval_t> vals;                                              \
    std::vector<char> live;                                                 \
  };                                                                        \
  typedef kh_##name##_t khash_##name##_t;                                   \
  static inline kh_##name##_t *kh_init_##name() {                           \
    return new kh_##name##_t();                                             \
  }                                                                         \
  static inline void kh_destroy_##name(kh_##name##_t *h) { delete h; }      \
  static inline void kh_clear_##name(kh_##name##_t *h) {                    \
    if (h) { h->idx.clear(); h->keys.clear(); h->vals.clear();              \
             h->live.clear(); }                                             \
  }                                                                         \
  static inline khint_t kh_get_##name(kh_##name##_t *h, const char *k) {    \
    auto it = h->idx.find(k);                                               \
    return it == h->idx.end() ? (khint_t)h->keys.size() : it->second;       \
  }                                                                         \
  static inline khint_t kh_put_##name(kh_##name##_t *h, const char *k,      \
                                      int *ret) {                           \
    auto it = h->idx.find(k);                                               \
    if (it != h->idx.end()) { *ret = 0; return it->second; }                \
    khint_t i = (khint_t)h->keys.size();                                    \
    h->idx.emplace(k, i);                                                   \
    h->keys.push_back(k);                                                   \
    h->vals.emplace_back();                                                 \
    h->live.push_back(1);                                                   \
    *ret = 1;                                                               \
    return i;                                                               \
  }                                                                         \
  static inline void kh_del_##name(kh_##name##_t *h, khint_t i) {           \
    if (i < h->live.size() && h->live[i]) {                                 \
      h->live[i] = 0;                                                       \
      h->idx.erase(h->keys[i]);                                             \
    }                                                                       \
  }

#define khash_t(name) kh_##name##_t
#define kh_init(name) kh_init_##name()
#define kh_destroy(name, h) kh_destroy_##name(h)
#define kh_clear(name, h) kh_clear_##name(h)
#define kh_get(name, h, k) kh_get_##name(h, k)
#define kh_put(name, h, k, r) kh_put_##name(h, k, r)
#define kh_del(name, h, i) kh_del_##name(h, i)
#define kh_exist(h, i) ((h)->live[i] != 0)
#define kh_key(h, i) ((h)->keys[i])
#define kh_value(h, i) ((h)->vals[i])
#define kh_val(h, i) ((h)->vals[i])
#define kh_begin(h) ((khint_t)0)
#define kh_end(h) ((khint_t)(h)->keys.size())
#define kh_size(h) ((khint_t)(h)->idx.size())

#endif /* PINDEL_TPU_KHASH_STUB_H */
