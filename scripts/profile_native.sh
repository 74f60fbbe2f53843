#!/bin/sh
# gprof the native software path (matcher + entropy attribution).
#
# Usage: scripts/profile_native.sh CORPUS_FILE [chain_depth lazy mml wlog iters]
# Builds qz_entropy.cc + prof_main.cc with -pg, runs the MT driver
# single-threaded (readable flat profile), prints the top of the profile.
# This is how the round-3 software-path split (matcher 72% / entropy 25%)
# and the single-probe rewrite's effect were measured.
set -e
cd "$(dirname "$0")/../qat_zstd_plugin_tpu/native"
CORPUS="${1:?usage: profile_native.sh CORPUS_FILE [chain lazy mml wlog iters]}"
g++ -O2 -g -pg -std=c++17 -fwrapv qz_entropy.cc prof_main.cc \
    -o /tmp/qz_prof_main -lpthread
cd /tmp
/tmp/qz_prof_main "$CORPUS" "${2:-2}" "${3:-0}" "${4:-6}" "${5:-19}" "${6:-3}"
gprof -b /tmp/qz_prof_main gmon.out | head -25
