#!/usr/bin/env bash
# Compile the reference mapper (read-only at /root/reference) as a test
# oracle, using our from-scratch bioparser shim for IO.  The binary is a
# build artifact under build/ (gitignored); no reference source is copied
# into this repository.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF="${REFERENCE_DIR:-/root/reference}"
OUT="$REPO/build"
mkdir -p "$OUT"
if [[ -x "$OUT/reference_mapper" && "$OUT/reference_mapper" -nt "$REPO/tools/oracle_shim/bioparser/include/bioparser/fasta_parser.hpp" ]]; then
  echo "reference oracle up to date: $OUT/reference_mapper"
  exit 0
fi
# -include: the reference relies on <algorithm>/<cstring> arriving
# transitively through the real bioparser headers.
g++ -O2 -std=c++17 -fopenmp -include algorithm -include cstring \
  -I "$REPO/tools/oracle_shim" \
  -I "$REPO/tools/oracle_shim/bioparser/include" \
  -I "$REF" \
  -I "$REF/team_alignment" \
  -I "$REF/team_minimizers" \
  "$REF/team_mapper.cpp" \
  "$REF/team_alignment/team_alignment.cpp" \
  "$REF/team_minimizers/team_minimizers.cpp" \
  -o "$OUT/reference_mapper"
echo "built $OUT/reference_mapper"
