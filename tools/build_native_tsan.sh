#!/usr/bin/env bash
# ThreadSanitizer flavor of the native host runtime (SURVEY.md section 5's
# race-detection item): rebuilds every native source with -fsanitize=thread
# plus the concurrent test harness (native/tsan_test.cpp) and runs it.
# Exit code 0 == no data races and thread-independent results.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/build"
mkdir -p "$OUT"
g++ -O1 -g -std=c++17 -fsanitize=thread -fPIE -pie \
  "$REPO"/native/*.cpp -lz -o "$OUT/native_tsan_test"
# Tiny fixture exercised concurrently by the harness.
FIX="$OUT/tsan_fixture.fasta"
printf '>a\nACGTACGT\n>b desc\nTTTTCCCC\nGGGG\n' > "$FIX"
TSAN_OPTIONS="halt_on_error=1" "$OUT/native_tsan_test" "$FIX"
echo "native TSAN suite passed"
