#!/usr/bin/env bash
# One-command MAP006 x E. coli K-12 validation run (VERDICT r04 item 9).
#
# Prereqs: tools/fetch_map006.sh has populated data/map006 (needs network;
# this sandbox has none), and tools/build_reference_oracle.sh has built
# build/reference_mapper.
#
# Maps MAP006-1 2D pass reads against GCF_000005845.2 with both the
# reference binary (single-threaded: deterministic output order) and this
# framework in --bug-compat mode, then byte-diffs the outputs.  Timings are
# printed for the perf comparison; drop --bug-compat and -c for a
# score-only throughput run.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
DATA="${1:-$REPO/data/map006}"
REF="$DATA/GCF_000005845.2_ASM584v2_genomic.fna"
READS="$DATA/MAP006-1_2D_pass.fasta"
[ -f "$REF" ] && [ -f "$READS" ] || {
    echo "dataset missing; run tools/fetch_map006.sh first" >&2; exit 1; }

OUT="$DATA/out"
mkdir -p "$OUT"

echo "== reference binary (single-thread) =="
time OMP_NUM_THREADS=1 "$REPO/build/reference_mapper" -c "$REF" "$READS" \
    > "$OUT/reference.paf"

echo "== bioinfo1_tpu (TPU if available) =="
time python -m bioinfo1_tpu.cli -c --bug-compat "$REF" "$READS" \
    > "$OUT/ours.paf"

diff "$OUT/reference.paf" "$OUT/ours.paf" \
    && echo "BYTE-IDENTICAL: $(wc -l < "$OUT/ours.paf") PAF rows"
