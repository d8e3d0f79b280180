/* Compile-only shim of the ksort macro API. */
#ifndef PINDEL_TPU_KSORT_STUB_H
#define PINDEL_TPU_KSORT_STUB_H

#include <algorithm>
#include <cstddef>

#define KSORT_INIT_GENERIC(type_t)                                         \
  static inline void ks_introsort_##type_t(size_t n, type_t *a) {          \
    std::sort(a, a + n);                                                   \
  }

#define ks_introsort(name, n, a) ks_introsort_##name(n, a)

#endif
