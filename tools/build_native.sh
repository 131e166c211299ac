#!/usr/bin/env bash
# Build the native host runtime (libbioinfo1_native.so): C++ pieces of the
# framework where the reference is native - bug-compat oracles, FASTA/FASTQ
# parsing/packing, PAF serialization.  ctypes-loaded by bioinfo1_tpu/native.py.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/build"
mkdir -p "$OUT"
SRC=()
for f in "$REPO"/native/*.cpp; do
  [[ "$(basename "$f")" == "tsan_test.cpp" ]] && continue  # harness has main()
  SRC+=("$f")
done
NEWEST="$(ls -t "${SRC[@]}" | head -1)"
if [[ -f "$OUT/libbioinfo1_native.so" && "$OUT/libbioinfo1_native.so" -nt "$NEWEST" ]]; then
  echo "native lib up to date: $OUT/libbioinfo1_native.so"
  exit 0
fi
g++ -O3 -std=c++17 -fPIC -shared -march=native -fopenmp \
  "${SRC[@]}" -lz -o "$OUT/libbioinfo1_native.so"
echo "built $OUT/libbioinfo1_native.so"
