#!/usr/bin/env bash
# Canonical convert recipe (mirrors reference docs/include/pipeline/convert.sh).
# Accepts .bam and .cram alike; CRAM needs no reference fasta (sequences are
# never reconstructed).
set -euo pipefail
IN_DIR=$1; NPZ_DIR=$2
mkdir -p "$NPZ_DIR"
for aln in "$IN_DIR"/*.bam "$IN_DIR"/*.cram; do
    [ -e "$aln" ] || continue
    id=$(basename "$aln")
    id=${id%.bam}; id=${id%.cram}
    wisecondorx-tpu convert "$aln" "$NPZ_DIR/$id.npz" --binsize 5000
done
