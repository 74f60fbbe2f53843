#!/bin/sh
# Build the native entropy runtime (libqz_entropy.so).
# Hardened flags mirror the reference's production CFLAGS
# (src/Makefile:66-71: stack protector, -fwrapv, PIC).
#
# Usage: build.sh [asan]
#   asan — sanitizer build (libqz_entropy_asan.so, ASan+UBSan), the
#   analog of the reference fuzz build's -fsanitize flags
#   (test/fuzzing/Makefile:58). Run tests against it via
#   QZ_NATIVE_SANITIZE=1 (see tests/test_sanitize.py).
#
# The .so is written to a temp file and renamed into place so a killed
# build can never leave a half-written library that a later import loads.
set -e
cd "$(dirname "$0")"
ARCH_FLAGS="${QZ_NATIVE_CFLAGS:--O3 -march=native}"
if [ "$1" = "asan" ]; then
    OUT=libqz_entropy_asan.so
    g++ -O1 -g -std=c++17 -shared -fPIC \
        -fsanitize=address,undefined -fno-sanitize-recover=undefined \
        -fno-omit-frame-pointer -fwrapv -Wall -Wextra -Wno-unused-parameter \
        qz_entropy.cc -o "$OUT.tmp.$$"
elif [ "$1" = "fuzz" ]; then
    # Coverage-guided fuzzer (GCC trace-pc + ASan/UBSan; no clang/libFuzzer
    # in this image — qz_fuzz.cc carries its own mutate/coverage loop).
    # The library TU is instrumented; the driver TU is not (self-coverage
    # would drown library edges).
    OUT=qz_fuzz
    g++ -O1 -g -std=c++17 -c \
        -fsanitize=address,undefined -fno-sanitize-recover=undefined \
        -fsanitize-coverage=trace-pc \
        -fno-omit-frame-pointer -fwrapv qz_entropy.cc -o qz_entropy_cov.o
    g++ -O1 -g -std=c++17 -c \
        -fsanitize=address,undefined -fno-sanitize-recover=undefined \
        -fno-omit-frame-pointer -fwrapv qz_fuzz.cc -o qz_fuzz.o
    g++ -fsanitize=address,undefined qz_entropy_cov.o qz_fuzz.o \
        -o "$OUT.tmp.$$" -lzstd -lpthread
    rm -f qz_entropy_cov.o qz_fuzz.o
else
    OUT=libqz_entropy.so
    # -DNDEBUG: the reserve-contract asserts (BackwardBitWriter) stay
    # live in the asan/fuzz builds and compile out of the hot path here.
    g++ $ARCH_FLAGS -DNDEBUG -std=c++17 -shared -fPIC \
        -fstack-protector-strong -fwrapv -Wall -Wextra -Wno-unused-parameter \
        qz_entropy.cc -o "$OUT.tmp.$$"
fi
mv -f "$OUT.tmp.$$" "$OUT"
echo "built $(pwd)/$OUT"
