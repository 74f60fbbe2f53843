#!/bin/sh
# CI recipe (the reference ships none — SURVEY §4 notes no CI config —
# so this defines the build/test/package gate for this framework):
#
#   1. build the native runtime (hardened flags) and its ASan/UBSan twin
#   2. run the full test suite on the CPU backend (8 virtual devices)
#      including the sanitizer battery and the 2-process distributed test
#   3. build a wheel
#
# Usage: sh scripts/ci.sh [wheel-out-dir]
set -e
cd "$(dirname "$0")/.."
OUT="${1:-dist}"

echo "== native build (release + asan) =="
sh qat_zstd_plugin_tpu/native/build.sh
sh qat_zstd_plugin_tpu/native/build.sh asan

echo "== tests =="
python -m pytest tests/ -q

echo "== wheel =="
pip wheel --no-deps --no-build-isolation -w "$OUT" . >/dev/null
ls -l "$OUT"/qat_zstd_plugin_tpu-*.whl "$OUT"/qat*zstd*plugin*tpu*.whl \
    2>/dev/null | tail -1

echo "CI OK"
