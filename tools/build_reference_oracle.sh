#!/bin/bash
# Build the reference pindel (from /root/reference, read-only) into /tmp as a
# golden-output TEST ORACLE for pindel-format (-p) inputs.  Links against our
# compile-only htslib stub (tools/htslib_stub) — BAM paths abort if reached.
# Nothing from the reference tree is copied into this repository.
set -euo pipefail

REF=${REF:-/root/reference/src}
STUB=$(cd "$(dirname "$0")/htslib_stub" && pwd)
OUT=${OUT:-/tmp/pindel_oracle}
mkdir -p "$OUT"

if [[ -x "$OUT/pindel" && -x "$OUT/pindel2vcf4tcga" \
      && "$OUT/pindel" -nt "$STUB/htslib/sam.h" \
      && "$OUT/pindel" -nt "$STUB/hts_stub.cpp" ]]; then
  echo "oracle up to date: $OUT/pindel"
  exit 0
fi

SOURCES="pindel.cpp reader.cpp reporter.cpp searcher.cpp parameter.cpp \
  refreader.cpp control_state.cpp search_deletions_nt.cpp \
  search_inversions.cpp search_inversions_nt.cpp bam2depth.cpp \
  search_tandem_duplications.cpp search_tandem_duplications_nt.cpp \
  output_sorter.cpp farend_searcher.cpp search_variant.cpp \
  searchshortinsertions.cpp searchdeletions.cpp output_file_data.cpp \
  bddata.cpp shifted_vector.cpp read_buffer.cpp \
  line_reader.cpp ifstream_line_reader.cpp gz_line_reader.cpp \
  pindel_read_reader.cpp user_defined_settings.cpp \
  fn_parameters.cpp logstream.cpp search_MEI_util.cpp \
  search_MEI.cpp assembly.cpp genotyping.cpp"

cd "$OUT"
pids=()
for s in $SOURCES; do
  g++ -w -O2 -fopenmp -include "$STUB/compat_abs.h" -I"$STUB" -I"$REF" \
      -c "$REF/$s" -o "${s%.cpp}.o" &
  pids+=($!)
done
g++ -w -O2 -I"$STUB" -c "$STUB/hts_stub.cpp" -o hts_stub.o &
pids+=($!)
fail=0
for p in "${pids[@]}"; do wait "$p" || fail=1; done
[[ $fail == 0 ]] || { echo "compile failed"; exit 1; }

g++ -O2 -fopenmp ./*.o -lm -lz -o pindel
g++ -w -O2 "$REF/pindel2vcf.cpp" -o pindel2vcf
g++ -w -O2 "$REF/pindel2vcf4tcga.cpp" -o pindel2vcf4tcga
g++ -w -O2 "$REF/SAM_2_PINDEL_cin_2011Sept26.cpp" -o sam2pindel
echo "built: $OUT/pindel $OUT/pindel2vcf $OUT/pindel2vcf4tcga $OUT/sam2pindel"
