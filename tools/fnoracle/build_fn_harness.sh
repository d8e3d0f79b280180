#!/bin/bash
# Build the reference-function test harness (tools/fnoracle/fn_harness.cpp)
# against the oracle build's object files.  pindel.o's main is renamed
# away with objcopy so the harness provides its own entry point.
set -euo pipefail

HERE=$(cd "$(dirname "$0")" && pwd)
TOOLS=$(dirname "$HERE")
STUB="$TOOLS/htslib_stub"
REF=${REF:-/root/reference/src}
OUT=${OUT:-/tmp/pindel_oracle}

"$TOOLS/build_reference_oracle.sh" >&2

if [[ -x "$OUT/fn_harness" && "$OUT/fn_harness" -nt "$HERE/fn_harness.cpp" \
      && "$OUT/fn_harness" -nt "$OUT/pindel" ]]; then
  echo "fn_harness up to date: $OUT/fn_harness"
  exit 0
fi

cd "$OUT"
objcopy --redefine-sym main=pindel_ref_main pindel.o pindel_nomain.o
g++ -w -O2 -fopenmp -include "$STUB/compat_abs.h" -I"$STUB" -I"$REF" \
    -c "$HERE/fn_harness.cpp" -o fn_harness.o
OBJS=$(ls ./*.o | grep -v -e '^\./pindel\.o$' -e fn_harness -e probe -e hts_stub)
OBJS="$OBJS hts_stub.o"
g++ -O2 -fopenmp fn_harness.o $OBJS -lm -lz -o fn_harness
echo "built: $OUT/fn_harness"
