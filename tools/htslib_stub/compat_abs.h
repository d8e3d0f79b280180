/* Forced-include compat shim for building the reference oracle with a
 * modern g++: old compilers resolved abs(unsigned) by converting to int.
 * Reproduce that exact (wrapping) behavior so oracle output is unchanged. */
#ifndef PINDEL_TPU_COMPAT_ABS_H
#define PINDEL_TPU_COMPAT_ABS_H
#ifdef __cplusplus
#include <cstdlib>
static inline int abs(unsigned int x) { return __builtin_abs((int)x); }
#endif
#endif
