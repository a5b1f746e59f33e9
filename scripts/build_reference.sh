#!/bin/bash
# Build the reference binaries out-of-tree (no GSL in the image; see
# scripts/gsl_shim).  Used only to GENERATE golden conformance outputs —
# nothing from /root/reference is copied into this repo.
set -euo pipefail

REF=${REF:-/root/reference/src}
OUT=${OUT:-/tmp/refbuild}
SHIM=$(cd "$(dirname "$0")/gsl_shim" && pwd)

mkdir -p "$OUT"
CXX=${CXX:-g++}
# Makefile flags (reference src/Makefile:7) + the shim include path
FLAGS="-O3 -Wall -fopenmp -msse4 -Wextra -I$SHIM -I$REF"

cd "$OUT"
$CXX $FLAGS -c -o zero_new.o "$SHIM/zero_new.cpp"
for obj in binmat pbm pnm GolombCoder coding util bsvd; do
  [ -f $obj.o ] && [ $obj.o -nt "$REF/$obj.cpp" ] || \
    $CXX $FLAGS -c -o $obj.o "$REF/$obj.cpp"
done

OBJ="binmat.o pbm.o pnm.o GolombCoder.o coding.o util.o zero_new.o"
for t in compress_test compress2_test compress3_test compress4_test \
         compress5_test compress6_test compress7_test compress8_test \
         patch_test patch2_test binmat_test pbm_test; do
  [ -f $t ] && [ $t -nt "$REF/$t.cpp" ] || \
    $CXX $FLAGS -o $t "$REF/$t.cpp" $OBJ -lm
done
$CXX $FLAGS -o bsvd_test "$REF/bsvd_test.cpp" bsvd.o $OBJ -lm
for t in bitplane_tool plane2pgm_tool; do
  [ -f $t ] && [ $t -nt "$REF/$t.cpp" ] || \
    $CXX $FLAGS -o $t "$REF/$t.cpp" $OBJ -lm
done
echo "reference binaries in $OUT"
