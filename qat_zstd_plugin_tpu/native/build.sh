#!/bin/sh
# Build the native entropy runtime (libqz_entropy.so).
# Hardened flags mirror the reference's production CFLAGS
# (src/Makefile:66-71: stack protector, -fwrapv, PIC).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC \
    -fstack-protector-strong -fwrapv -Wall -Wextra -Wno-unused-parameter \
    qz_entropy.cc -o libqz_entropy.so
echo "built $(pwd)/libqz_entropy.so"
