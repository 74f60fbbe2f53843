"""ctypes wrapper around stock libzstd — the bit-exactness oracle.

The reference plugin's whole test strategy is "stock libzstd is the judge"
(reference: test/test.c:123-131 decompresses plugin output with stock
ZSTD_decompress and memcmps). We keep that exact strategy: every frame this
framework produces must decode bit-exactly through the system libzstd
(verified 1.5.4, the version the reference pins as its oracle).

This module is TEST/FALLBACK infrastructure only — the compression path never
calls into libzstd.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from functools import lru_cache


class ZstdOracleError(RuntimeError):
    pass


@lru_cache(maxsize=1)
def _lib():
    name = ctypes.util.find_library("zstd") or "libzstd.so.1"
    try:
        lib = ctypes.CDLL(name)
    except OSError as e:  # pragma: no cover
        raise ZstdOracleError(f"stock libzstd not found: {e}") from e
    lib.ZSTD_versionNumber.restype = ctypes.c_uint
    lib.ZSTD_isError.restype = ctypes.c_uint
    lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
    lib.ZSTD_getErrorName.restype = ctypes.c_char_p
    lib.ZSTD_getErrorName.argtypes = [ctypes.c_size_t]
    lib.ZSTD_decompress.restype = ctypes.c_size_t
    lib.ZSTD_decompress.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t]
    lib.ZSTD_compress.restype = ctypes.c_size_t
    lib.ZSTD_compress.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_int]
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
    lib.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
    lib.ZSTD_getFrameContentSize.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    return lib


def available() -> bool:
    try:
        _lib()
        return True
    except ZstdOracleError:
        return False


def version() -> int:
    """libzstd version number, e.g. 10504 == 1.5.4."""
    return _lib()._handle and _lib().ZSTD_versionNumber()


def decompress(frame: bytes, expected_size: int | None = None) -> bytes:
    """Decode a zstd frame with stock libzstd. Raises on any decode error."""
    lib = _lib()
    if expected_size is None:
        sz = lib.ZSTD_getFrameContentSize(frame, len(frame))
        # ZSTD_CONTENTSIZE_UNKNOWN == -1, _ERROR == -2 (as unsigned)
        if sz >= 2**64 - 2:
            # Unknown content size: grow a guess buffer.
            cap = max(1 << 16, len(frame) * 64)
        else:
            cap = int(sz)
    else:
        cap = expected_size
    # Unknown-content-size frames (no FCS) need a growing guess buffer:
    # retry on dstSize_tooSmall up to 1 GiB.
    while True:
        dst = ctypes.create_string_buffer(max(cap, 1))
        ret = lib.ZSTD_decompress(dst, cap, frame, len(frame))
        if not lib.ZSTD_isError(ret):
            return dst.raw[:ret]
        name = lib.ZSTD_getErrorName(ret).decode()
        if "too small" in name and cap < (1 << 30) \
                and expected_size is None:
            cap *= 8
            continue
        raise ZstdOracleError(f"oracle decode failed: {name}")


def compress(data: bytes, level: int = 1) -> bytes:
    """Stock-libzstd compression — the CPU A/B baseline (the reference
    benchmark's software mode, test/benchmark.c -m0)."""
    lib = _lib()
    cap = lib.ZSTD_compressBound(len(data))
    dst = ctypes.create_string_buffer(cap)
    ret = lib.ZSTD_compress(dst, cap, data, len(data), level)
    if lib.ZSTD_isError(ret):
        raise ZstdOracleError(
            f"oracle compress failed: {lib.ZSTD_getErrorName(ret).decode()}")
    return dst.raw[:ret]


def roundtrip_ok(frame: bytes, original: bytes) -> bool:
    """True iff stock zstd decodes `frame` bit-exactly to `original`."""
    try:
        return decompress(frame, len(original)) == original
    except ZstdOracleError:
        return False
