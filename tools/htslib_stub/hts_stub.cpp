/* Aborting implementations of the htslib functions the reference pindel
 * links against.  The golden-oracle builds only run pindel-format (-p)
 * inputs, which never reach these. */
#include <cstdio>
#include <cstdlib>

#include "htslib/sam.h"

extern "C" {

const char seq_nt16_str[] = "=ACMGRSVTWYHKDBN";

static void *die(const char *fn) {
  std::fprintf(stderr, "htslib stub: %s called — BAM inputs are not "
                       "supported by the oracle build\n", fn);
  std::abort();
}

samFile *sam_open(const char *, const char *) {
  return (samFile *)die("sam_open");
}
int sam_close(samFile *) { die("sam_close"); return -1; }
bam_hdr_t *sam_hdr_read(samFile *) { return (bam_hdr_t *)die("sam_hdr_read"); }
void bam_hdr_destroy(bam_hdr_t *) { die("bam_hdr_destroy"); }
int bam_name2id(bam_hdr_t *, const char *) { die("bam_name2id"); return -1; }
hts_idx_t *sam_index_load(samFile *, const char *) {
  return (hts_idx_t *)die("sam_index_load");
}
hts_itr_t *sam_itr_queryi(const hts_idx_t *, int, int, int) {
  return (hts_itr_t *)die("sam_itr_queryi");
}
int sam_itr_next_impl(samFile *, hts_itr_t *, bam1_t *) {
  die("sam_itr_next"); return -1;
}
int sam_read1(samFile *, bam_hdr_t *, bam1_t *) {
  die("sam_read1"); return -1;
}
void hts_itr_destroy(hts_itr_t *) { die("hts_itr_destroy"); }
void hts_idx_destroy(hts_idx_t *) { die("hts_idx_destroy"); }

bam1_t *bam_init1(void) { return (bam1_t *)calloc(1, sizeof(bam1_t)); }
void bam_destroy1(bam1_t *b) { if (b) { free(b->data); free(b); } }
bam1_t *bam_dup1(const bam1_t *) { return (bam1_t *)die("bam_dup1"); }

uint8_t *bam_aux_get(const bam1_t *, const char *) {
  return (uint8_t *)die("bam_aux_get");
}
int64_t bam_aux2i(const uint8_t *) { die("bam_aux2i"); return 0; }
char bam_aux2A(const uint8_t *) { die("bam_aux2A"); return 0; }
char *bam_aux2Z(const uint8_t *) { return (char *)die("bam_aux2Z"); }

bam_mplp_t bam_mplp_init(int, bam_plp_auto_f, void **) {
  return (bam_mplp_t)die("bam_mplp_init");
}
int bam_mplp_auto(bam_mplp_t, int *, int *, int *, const bam_pileup1_t **) {
  die("bam_mplp_auto"); return -1;
}
void bam_mplp_destroy(bam_mplp_t) { die("bam_mplp_destroy"); }

} /* extern "C" */
