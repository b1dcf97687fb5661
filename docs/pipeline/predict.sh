#!/usr/bin/env bash
# Canonical prediction recipe.
set -euo pipefail
SAMPLE=$1; REF=$2; OUTID=$3
wisecondorx-tpu predict "$SAMPLE" "$REF" "$OUTID" --bed --plot
