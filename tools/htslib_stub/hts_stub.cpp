/* Minimal REAL implementation of the htslib SAM/BAM API surface the
 * reference pindel links against, so the golden-output oracle can run BAM
 * inputs (SR channel, RP discovery, DD/-q mode, bam2depth pileup).
 *
 * This is our own from-scratch reader, not htslib: BGZF is a stream of
 * gzip members, which zlib's gzFile decodes transparently; the whole file
 * is parsed once into memory and range queries are linear scans with a
 * binary-search start (no .bai parsing — sam_index_load returns a token).
 * The BAM on-disk record layout after the 32-byte fixed prefix is exactly
 * the bam1_t::data layout (qname, cigar, seq4, qual, aux), so records are
 * stored as raw byte slices and copied straight into bam1_t.
 */
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

#include "htslib/sam.h"

namespace {

struct RawRec {
  int32_t tid;
  int32_t pos;
  int32_t endpos;      // half-open reference end (pos+1 when unmapped/empty)
  uint32_t bin_mq_nl;
  uint32_t flag_nc;
  int32_t l_qseq;
  int32_t mtid, mpos, isize;
  uint64_t data_off;   // into Bam::pool
  uint32_t data_len;
};

struct Bam {
  bam_hdr_t hdr{};
  std::vector<RawRec> recs;
  std::string pool;
  std::vector<int64_t> tid_begin, tid_end, tid_max_span;
  bool ok = false;
  size_t seq_cursor = 0;   // for sam_read1 sequential reads
};

struct Iter {
  Bam *bam;
  int tid, beg, end;
  int64_t i;
};

int32_t ref_span_of(const uint8_t *cigar, uint16_t n_cigar) {
  int64_t span = 0;
  for (uint16_t k = 0; k < n_cigar; k++) {
    uint32_t cv;
    memcpy(&cv, cigar + 4 * k, 4);
    uint32_t op = cv & 0xf;
    if (op == BAM_CMATCH || op == BAM_CDEL || op == BAM_CREF_SKIP ||
        op == BAM_CEQUAL || op == BAM_CDIFF)
      span += cv >> 4;
  }
  return static_cast<int32_t>(span);
}

bool read_exact(gzFile f, void *buf, unsigned n) {
  return gzread(f, buf, n) == static_cast<int>(n);
}

Bam *load_bam(const char *path) {
  auto *bam = new Bam();
  gzFile f = gzopen(path, "rb");
  if (!f) return bam;
  gzbuffer(f, 1 << 20);
  char magic[4];
  if (!read_exact(f, magic, 4) || memcmp(magic, "BAM\1", 4) != 0) {
    gzclose(f);
    return bam;
  }
  int32_t l_text = 0;
  read_exact(f, &l_text, 4);
  bam->hdr.l_text = l_text;
  bam->hdr.text = (char *)calloc(1, l_text + 1);
  if (l_text) read_exact(f, bam->hdr.text, l_text);
  int32_t n_ref = 0;
  read_exact(f, &n_ref, 4);
  bam->hdr.n_targets = n_ref;
  bam->hdr.target_name = (char **)calloc(n_ref, sizeof(char *));
  bam->hdr.target_len = (uint32_t *)calloc(n_ref, sizeof(uint32_t));
  for (int32_t i = 0; i < n_ref; i++) {
    int32_t l_name = 0, l_ref = 0;
    read_exact(f, &l_name, 4);
    bam->hdr.target_name[i] = (char *)calloc(1, l_name + 1);
    read_exact(f, bam->hdr.target_name[i], l_name);
    read_exact(f, &l_ref, 4);
    bam->hdr.target_len[i] = l_ref;
  }
  std::vector<uint8_t> buf;
  int32_t block_size;
  while (read_exact(f, &block_size, 4)) {
    if (block_size < 32) break;
    buf.resize(block_size);
    if (!read_exact(f, buf.data(), block_size)) break;
    const uint8_t *p = buf.data();
    RawRec r{};
    memcpy(&r.tid, p, 4);
    memcpy(&r.pos, p + 4, 4);
    memcpy(&r.bin_mq_nl, p + 8, 4);
    memcpy(&r.flag_nc, p + 12, 4);
    memcpy(&r.l_qseq, p + 16, 4);
    memcpy(&r.mtid, p + 20, 4);
    memcpy(&r.mpos, p + 24, 4);
    memcpy(&r.isize, p + 28, 4);
    uint16_t flag = r.flag_nc >> 16;
    uint16_t n_cigar = r.flag_nc & 0xffff;
    uint8_t l_qname = r.bin_mq_nl & 0xff;
    int32_t span = (flag & BAM_FUNMAP)
                       ? 0
                       : ref_span_of(p + 32 + l_qname, n_cigar);
    r.endpos = span > 0 ? r.pos + span : r.pos + 1;
    r.data_off = bam->pool.size();
    r.data_len = block_size - 32;
    bam->pool.append(reinterpret_cast<const char *>(p + 32), r.data_len);
    bam->recs.push_back(r);
  }
  gzclose(f);
  size_t nt = bam->hdr.n_targets;
  bam->tid_begin.assign(nt, -1);
  bam->tid_end.assign(nt, -1);
  bam->tid_max_span.assign(nt, 1);
  for (size_t i = 0; i < bam->recs.size(); i++) {
    int32_t t = bam->recs[i].tid;
    if (t < 0 || static_cast<size_t>(t) >= nt) continue;
    if (bam->tid_begin[t] < 0) bam->tid_begin[t] = i;
    bam->tid_end[t] = i + 1;
    int64_t span = bam->recs[i].endpos - bam->recs[i].pos;
    if (span > bam->tid_max_span[t]) bam->tid_max_span[t] = span;
  }
  bam->ok = true;
  return bam;
}

void fill_bam1(Bam *bam, const RawRec &r, bam1_t *b) {
  b->core.tid = r.tid;
  b->core.pos = r.pos;
  b->core.bin = (r.bin_mq_nl >> 16) & 0xffff;
  b->core.qual = (r.bin_mq_nl >> 8) & 0xff;
  b->core.l_qname = r.bin_mq_nl & 0xff;
  b->core.flag = r.flag_nc >> 16;
  b->core.n_cigar = r.flag_nc & 0xffff;
  b->core.l_qseq = r.l_qseq;
  b->core.mtid = r.mtid;
  b->core.mpos = r.mpos;
  b->core.isize = r.isize;
  if (b->m_data < (int)r.data_len) {
    b->data = (uint8_t *)realloc(b->data, r.data_len);
    b->m_data = r.data_len;
  }
  memcpy(b->data, bam->pool.data() + r.data_off, r.data_len);
  b->l_data = r.data_len;
}

}  // namespace

extern "C" {

const char seq_nt16_str[] = "=ACMGRSVTWYHKDBN";

samFile *sam_open(const char *fn, const char *) {
  Bam *bam = load_bam(fn);
  if (!bam->ok) {
    std::fprintf(stderr, "hts stub: cannot read BAM %s\n", fn);
    delete bam;
    return nullptr;
  }
  return reinterpret_cast<samFile *>(bam);
}

int sam_close(samFile *fp) {
  auto *bam = reinterpret_cast<Bam *>(fp);
  if (bam) {
    free(bam->hdr.text);
    for (int i = 0; i < bam->hdr.n_targets; i++) free(bam->hdr.target_name[i]);
    free(bam->hdr.target_name);
    free(bam->hdr.target_len);
    delete bam;
  }
  return 0;
}

bam_hdr_t *sam_hdr_read(samFile *fp) {
  return &reinterpret_cast<Bam *>(fp)->hdr;
}

void bam_hdr_destroy(bam_hdr_t *) { /* owned by Bam */ }

int bam_name2id(bam_hdr_t *h, const char *ref) {
  for (int i = 0; i < h->n_targets; i++)
    if (strcmp(h->target_name[i], ref) == 0) return i;
  return -1;
}

hts_idx_t *sam_index_load(samFile *fp, const char *) {
  /* token: the Bam itself (range queries scan the in-memory records) */
  return reinterpret_cast<hts_idx_t *>(fp);
}

hts_itr_t *sam_itr_queryi(const hts_idx_t *idx, int tid, int beg, int end) {
  auto *bam = reinterpret_cast<Bam *>(const_cast<hts_idx_t *>(idx));
  auto *it = new Iter{bam, tid, beg, end, 0};
  if (tid < 0 || tid >= bam->hdr.n_targets || bam->tid_begin[tid] < 0) {
    it->i = -1;
    return reinterpret_cast<hts_itr_t *>(it);
  }
  int64_t lo = bam->tid_begin[tid], hi = bam->tid_end[tid];
  int64_t target = static_cast<int64_t>(beg) - bam->tid_max_span[tid];
  while (lo < hi) {
    int64_t mid = (lo + hi) / 2;
    if (bam->recs[mid].pos < target) lo = mid + 1;
    else hi = mid;
  }
  it->i = lo;
  return reinterpret_cast<hts_itr_t *>(it);
}

int sam_itr_next_impl(samFile *, hts_itr_t *itr, bam1_t *b) {
  auto *it = reinterpret_cast<Iter *>(itr);
  if (it->i < 0) return -1;
  Bam *bam = it->bam;
  while (it->i < bam->tid_end[it->tid]) {
    const RawRec &r = bam->recs[it->i++];
    if (r.pos >= it->end) return -1;
    if (r.endpos <= it->beg) continue;
    fill_bam1(bam, r, b);
    return b->l_data;
  }
  return -1;
}

int sam_read1(samFile *fp, bam_hdr_t *, bam1_t *b) {
  auto *bam = reinterpret_cast<Bam *>(fp);
  if (bam->seq_cursor >= bam->recs.size()) return -1;
  fill_bam1(bam, bam->recs[bam->seq_cursor++], b);
  return b->l_data;
}

void hts_itr_destroy(hts_itr_t *itr) {
  delete reinterpret_cast<Iter *>(itr);
}

void hts_idx_destroy(hts_idx_t *) { /* token, nothing to free */ }

bam1_t *bam_init1(void) { return (bam1_t *)calloc(1, sizeof(bam1_t)); }
void bam_destroy1(bam1_t *b) {
  if (b) {
    free(b->data);
    free(b);
  }
}
bam1_t *bam_dup1(const bam1_t *bsrc) {
  bam1_t *b = bam_init1();
  b->core = bsrc->core;
  b->l_data = b->m_data = bsrc->l_data;
  b->data = (uint8_t *)malloc(bsrc->l_data);
  memcpy(b->data, bsrc->data, bsrc->l_data);
  return b;
}

uint8_t *bam_aux_get(const bam1_t *b, const char tag[2]) {
  const uint8_t *aux = bam_get_qual(b) + b->core.l_qseq;
  const uint8_t *end = b->data + b->l_data;
  while (aux + 3 <= end) {
    char t0 = aux[0], t1 = aux[1], type = aux[2];
    const uint8_t *p = aux + 3;
    size_t skip = 0;
    switch (type) {
      case 'A': case 'c': case 'C': skip = 1; break;
      case 's': case 'S': skip = 2; break;
      case 'i': case 'I': case 'f': skip = 4; break;
      case 'd': skip = 8; break;
      case 'Z': case 'H': {
        const uint8_t *q = p;
        while (q < end && *q) q++;
        skip = (q - p) + 1;
        break;
      }
      case 'B': {
        if (p + 5 > end) return nullptr;
        char sub = p[0];
        uint32_t n;
        memcpy(&n, p + 1, 4);
        size_t esz = (sub == 'c' || sub == 'C') ? 1
                     : (sub == 's' || sub == 'S') ? 2
                     : 4;
        skip = 5 + esz * n;
        break;
      }
      default:
        return nullptr;
    }
    if (t0 == tag[0] && t1 == tag[1])
      return const_cast<uint8_t *>(aux + 2);  /* points at type byte */
    aux = p + skip;
  }
  return nullptr;
}

int64_t bam_aux2i(const uint8_t *s) {
  switch (*s) {
    case 'c': return *(const int8_t *)(s + 1);
    case 'C': return *(const uint8_t *)(s + 1);
    case 's': { int16_t v; memcpy(&v, s + 1, 2); return v; }
    case 'S': { uint16_t v; memcpy(&v, s + 1, 2); return v; }
    case 'i': { int32_t v; memcpy(&v, s + 1, 4); return v; }
    case 'I': { uint32_t v; memcpy(&v, s + 1, 4); return v; }
    default: return 0;
  }
}

char bam_aux2A(const uint8_t *s) { return *s == 'A' ? (char)s[1] : 0; }

char *bam_aux2Z(const uint8_t *s) {
  return (*s == 'Z' || *s == 'H') ? (char *)(s + 1) : nullptr;
}

/* ---- multi-file pileup (bam2depth's usage only) ---- */

struct PileRead {
  bam1_t *b;
  int32_t endpos;
};

struct bam_mplp_s {
  int n;
  bam_plp_auto_f func;
  void **data;
  std::vector<std::vector<PileRead>> active;
  std::vector<bam1_t *> next;      // one lookahead record per file
  std::vector<bool> eof;
  std::vector<std::vector<bam_pileup1_t>> plp_store;
  int cur_tid, cur_pos;
  bool started;
};

bam_mplp_t bam_mplp_init(int n, bam_plp_auto_f func, void **data) {
  auto *m = new bam_mplp_s();
  m->n = n;
  m->func = func;
  m->data = data;
  m->active.resize(n);
  m->next.assign(n, nullptr);
  m->eof.assign(n, false);
  m->plp_store.resize(n);
  m->cur_tid = -1;
  m->cur_pos = -1;
  m->started = false;
  for (int i = 0; i < n; i++) {
    m->next[i] = bam_init1();
    if (m->func(m->data[i], m->next[i]) < 0) m->eof[i] = true;
  }
  return m;
}

static int32_t rec_endpos(const bam1_t *b) {
  if (b->core.flag & BAM_FUNMAP) return b->core.pos + 1;
  int32_t span =
      ref_span_of((const uint8_t *)bam_get_cigar(b), b->core.n_cigar);
  return span > 0 ? b->core.pos + span : b->core.pos + 1;
}

/* qpos/is_del/is_refskip for reference position pos within read b */
static bool fill_pileup1(bam1_t *b, int pos, bam_pileup1_t *out) {
  int32_t ref = b->core.pos;
  int32_t q = 0;
  const uint32_t *cig = bam_get_cigar(b);
  for (uint16_t k = 0; k < b->core.n_cigar; k++) {
    uint32_t op = cig[k] & 0xf, len = cig[k] >> 4;
    bool consume_ref = (op == BAM_CMATCH || op == BAM_CDEL ||
                        op == BAM_CREF_SKIP || op == BAM_CEQUAL ||
                        op == BAM_CDIFF);
    bool consume_q = (op == BAM_CMATCH || op == BAM_CINS ||
                      op == BAM_CSOFT_CLIP || op == BAM_CEQUAL ||
                      op == BAM_CDIFF);
    if (consume_ref && pos < ref + (int32_t)len) {
      out->b = b;
      out->is_del = (op == BAM_CDEL) ? 1 : 0;
      out->is_refskip = (op == BAM_CREF_SKIP) ? 1 : 0;
      out->qpos = consume_q ? q + (pos - ref) : (q > 0 ? q - 1 : 0);
      return true;
    }
    if (consume_ref) ref += len;
    if (consume_q) q += len;
  }
  return false;
}

int bam_mplp_auto(bam_mplp_t m, int *tid, int *pos, int *n_plp,
                  const bam_pileup1_t **plp) {
  /* advance position: next covered position over union of all files */
  while (true) {
    /* pull in reads starting at or before candidate positions */
    int next_tid = INT32_MAX;
    int64_t next_pos = INT64_MAX;
    for (int i = 0; i < m->n; i++) {
      if (!m->eof[i] && m->next[i]->core.tid >= 0) {
        if (m->next[i]->core.tid < next_tid ||
            (m->next[i]->core.tid == next_tid &&
             m->next[i]->core.pos < next_pos)) {
          next_tid = m->next[i]->core.tid;
          next_pos = m->next[i]->core.pos;
        }
      }
    }
    int cand_tid;
    int cand_pos;
    if (!m->started) {
      if (next_tid == INT32_MAX) return 0;
      cand_tid = next_tid;
      cand_pos = (int)next_pos;
    } else {
      cand_tid = m->cur_tid;
      cand_pos = m->cur_pos + 1;
    }
    /* load all reads with tid == cand_tid and pos <= cand_pos */
    for (int i = 0; i < m->n; i++) {
      while (!m->eof[i] &&
             (m->next[i]->core.tid < cand_tid ||
              (m->next[i]->core.tid == cand_tid &&
               m->next[i]->core.pos <= cand_pos))) {
        if (!(m->next[i]->core.flag & BAM_FUNMAP) &&
            m->next[i]->core.tid == cand_tid) {
          PileRead pr{bam_dup1(m->next[i]), 0};
          pr.endpos = rec_endpos(pr.b);
          m->active[i].push_back(pr);
        }
        if (m->func(m->data[i], m->next[i]) < 0) m->eof[i] = true;
      }
      /* drop reads ending before cand_pos */
      auto &act = m->active[i];
      size_t w = 0;
      for (size_t r = 0; r < act.size(); r++) {
        if (act[r].b->core.tid == cand_tid && act[r].endpos > cand_pos) {
          act[w++] = act[r];
        } else {
          bam_destroy1(act[r].b);
        }
      }
      act.resize(w);
    }
    /* coverage at cand_pos? */
    int total = 0;
    for (int i = 0; i < m->n; i++) {
      m->plp_store[i].clear();
      for (auto &pr : m->active[i]) {
        if (pr.b->core.pos <= cand_pos && cand_pos < pr.endpos) {
          bam_pileup1_t p1{};
          if (fill_pileup1(pr.b, cand_pos, &p1)) m->plp_store[i].push_back(p1);
        }
      }
      n_plp[i] = (int)m->plp_store[i].size();
      plp[i] = m->plp_store[i].data();
      total += n_plp[i];
    }
    m->started = true;
    m->cur_tid = cand_tid;
    m->cur_pos = cand_pos;
    if (total > 0) {
      *tid = cand_tid;
      *pos = cand_pos;
      return total;
    }
    /* no coverage here: jump to the next read start if any, else done */
    bool any_active = false;
    for (int i = 0; i < m->n; i++) any_active |= !m->active[i].empty();
    if (!any_active) {
      if (next_tid == INT32_MAX) return 0;
      if (next_tid < cand_tid ||
          (next_tid == cand_tid && next_pos <= cand_pos))
        continue; /* defensive: will be consumed next round */
      m->cur_tid = next_tid;
      m->cur_pos = (int)next_pos - 1;
    }
  }
}

void bam_mplp_destroy(bam_mplp_t m) {
  for (int i = 0; i < m->n; i++) {
    for (auto &pr : m->active[i]) bam_destroy1(pr.b);
    if (m->next[i]) bam_destroy1(m->next[i]);
  }
  delete m;
}

} /* extern "C" */
