#!/bin/sh
# Long coverage-guided fuzz campaign (see native/qz_fuzz.cc).
# Usage: fuzz.sh [seconds-per-target] [corpus-root]
set -e
cd "$(dirname "$0")/.."
SECS="${1:-600}"
ROOT="${2:-.fuzz_corpus}"
(cd qat_zstd_plugin_tpu/native && bash build.sh fuzz)
mkdir -p "$ROOT"
for t in roundtrip extend stream lz4s mt; do
    echo "=== $t ($SECS s) ==="
    ./qat_zstd_plugin_tpu/native/qz_fuzz "$t" "$SECS" "$ROOT/$t"
done
echo "=== decoder-differential ($SECS s) ==="
python scripts/fuzz_decoder.py "$SECS" "$ROOT/decoder"
echo "fuzz campaign clean"
