#!/usr/bin/env bash
# Canonical reference-build recipe (>=50 negative controls recommended).
set -euo pipefail
NPZ_DIR=$1; REF=$2; BINSIZE=${3:-100000}
# --checkpoint-dir makes an interrupted build resumable (removed on success)
wisecondorx-tpu newref "$NPZ_DIR"/*.npz "$REF" --binsize "$BINSIZE" \
    --checkpoint-dir "$REF.ckpt"
