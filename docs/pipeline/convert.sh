#!/usr/bin/env bash
# Canonical convert recipe (mirrors reference docs/include/pipeline/convert.sh)
set -euo pipefail
BAM_DIR=$1; NPZ_DIR=$2
mkdir -p "$NPZ_DIR"
for bam in "$BAM_DIR"/*.bam; do
    id=$(basename "$bam" .bam)
    wisecondorx-tpu convert "$bam" "$NPZ_DIR/$id.npz" --binsize 5000
done
