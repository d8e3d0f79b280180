/* Compile-only shim of the kstring API surface the reference touches. */
#ifndef PINDEL_TPU_KSTRING_STUB_H
#define PINDEL_TPU_KSTRING_STUB_H

#include <cstddef>

typedef struct kstring_t {
  size_t l, m;
  char *s;
} kstring_t;

#endif
