#!/usr/bin/env bash
# Canonical prediction recipes.
set -euo pipefail
# Single sample:
#   predict.sh sample.npz reference.npz outid
# Whole plate (data-parallel over all chips; one invocation):
#   predict.sh --batch reference.npz outdir plate/*.npz
if [ "$1" = "--batch" ]; then
    REF=$2; OUTDIR=$3; shift 3
    wisecondorx-tpu predict-batch "$REF" "$OUTDIR" --infiles "$@" --bed --plot
else
    SAMPLE=$1; REF=$2; OUTID=$3
    wisecondorx-tpu predict "$SAMPLE" "$REF" "$OUTID" --bed --plot
fi
