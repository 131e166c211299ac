#!/usr/bin/env bash
# Fetch the reference's real evaluation dataset (not shipped in either
# repo; named in /root/reference/.gitignore:4-6 and README.md:42):
#   - ONT reads: MAP006-1 2D pass reads (Loman Labs E. coli K-12 MAP006)
#   - genome:    E. coli K-12 MG1655, GCF_000005845.2 (ASM584v2)
#
# Run anywhere with network access, then validate with run_map006.sh (one
# command: maps the reads with this framework AND the compiled reference
# binary, and byte-diffs the outputs).  This sandbox has no egress, so the
# fetch cannot run here - see PERFORMANCE.md "Real-data validation".
set -euo pipefail
DATA="${1:-$(dirname "$0")/../data/map006}"
mkdir -p "$DATA"
cd "$DATA"

# E. coli K-12 MG1655 genome (4,641,652 bp) from NCBI.
if [ ! -f GCF_000005845.2_ASM584v2_genomic.fna ]; then
    curl -fLO "https://ftp.ncbi.nlm.nih.gov/genomes/all/GCF/000/005/845/GCF_000005845.2_ASM584v2/GCF_000005845.2_ASM584v2_genomic.fna.gz"
    gunzip GCF_000005845.2_ASM584v2_genomic.fna.gz
fi

# Loman Labs MAP006 2D pass reads (mirrored on the nanopore-wgs EBI/S3
# buckets; the original lab link may rot - try both).
for f in MAP006-1_2D_pass.fasta MAP006-2_2D_pass.fasta; do
    [ -f "$f" ] && continue
    curl -fLo "$f" "https://nanopore.s3.climb.ac.uk/$f" \
        || curl -fLo "$f.gz" "https://nanopore.s3.climb.ac.uk/$f.gz" \
        || { echo "NOTE: $f not fetched automatically; download the" \
                  "MAP006 2D pass reads from the Loman Labs nanopore" \
                  "data release and place them here." >&2; }
    [ -f "$f.gz" ] && gunzip "$f.gz" || true
done

ls -l
echo "done: $DATA"
