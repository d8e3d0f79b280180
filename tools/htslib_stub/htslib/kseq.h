/* Compile-only shim: the reference includes this header but uses nothing
 * from it on the pindel-format input path our oracle runs exercise. */
#ifndef PINDEL_TPU_KSEQ_STUB_H
#define PINDEL_TPU_KSEQ_STUB_H
#endif
