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
import threading
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


# ---------------------------------------------------------------------------
# Real sequence-producer registration (the reference's core integration:
# ZSTD_registerSequenceProducer + ZSTD_compress2 driving qatSequenceProducer,
# src/qatseqprod.h:110-116 / test/test.c:103-116). Stock libzstd is the one
# consumer that defines the producer contract, so we register ours with it.

class ZstdSequence(ctypes.Structure):
    """ZSTD_Sequence (zstd.h:1240-1278): 4 x u32."""
    _fields_ = [("offset", ctypes.c_uint32),
                ("litLength", ctypes.c_uint32),
                ("matchLength", ctypes.c_uint32),
                ("rep", ctypes.c_uint32)]


# size_t (void* state, ZSTD_Sequence* out, size_t cap, const void* src,
#         size_t srcSize, const void* dict, size_t dictSize, int level,
#         size_t windowSize)   -- zstd.h:2935-2945
SEQPROD_CFUNC = ctypes.CFUNCTYPE(
    ctypes.c_size_t, ctypes.c_void_p, ctypes.POINTER(ZstdSequence),
    ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
    ctypes.c_size_t, ctypes.c_int, ctypes.c_size_t)

ZSTD_SEQUENCE_PRODUCER_ERROR = ctypes.c_size_t(-1).value  # zstd.h:2933

ZSTD_c_compressionLevel = 100
ZSTD_c_enableSeqProducerFallback = 1014   # experimentalParam17, zstd.h:2128
ZSTD_c_searchForExternalRepcodes = 1016   # experimentalParam19, zstd.h:2164
ZSTD_ps_enable = 1


@lru_cache(maxsize=1)
def _cctx_lib():
    lib = _lib()
    lib.ZSTD_createCCtx.restype = ctypes.c_void_p
    lib.ZSTD_freeCCtx.argtypes = [ctypes.c_void_p]
    lib.ZSTD_CCtx_setParameter.restype = ctypes.c_size_t
    lib.ZSTD_CCtx_setParameter.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.ZSTD_compress2.restype = ctypes.c_size_t
    lib.ZSTD_compress2.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
        ctypes.c_size_t]
    lib.ZSTD_registerSequenceProducer.restype = None
    lib.ZSTD_registerSequenceProducer.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, SEQPROD_CFUNC]
    return lib


def compress_with_producer(data: bytes, produce, level: int = 1,
                           fallback: bool = True,
                           search_repcodes: bool = False) -> bytes:
    """ZSTD_compress2 with `produce` registered as the external sequence
    producer — the exact integration shape of the reference
    (test/test.c:103-116: register, enable fallback, compress2).

    produce(block: bytes, level: int, window_size: int) must return a list
    of (offset, lit_length, match_length) triples covering the block (final
    entry literals-only: offset == match_length == 0), or None for
    producer-error (libzstd then software-fallbacks the block when
    `fallback`).
    """
    lib = _cctx_lib()
    calls = {"blocks": 0, "errors": 0}

    @SEQPROD_CFUNC
    def cb(_state, out_seqs, cap, src, src_size, _dict, dict_size, clevel,
           wsize):
        try:
            if dict_size:  # dictionaries unsupported (src/qatseqprod.h:98)
                calls["errors"] += 1
                return ZSTD_SEQUENCE_PRODUCER_ERROR
            block = ctypes.string_at(src, src_size)
            seqs = produce(block, clevel, wsize)
            if seqs is None or len(seqs) > cap:
                calls["errors"] += 1
                return ZSTD_SEQUENCE_PRODUCER_ERROR
            for i, (off, lit, ml) in enumerate(seqs):
                out_seqs[i] = ZstdSequence(off, lit, ml, 0)
            calls["blocks"] += 1
            return len(seqs)
        except Exception:
            calls["errors"] += 1
            return ZSTD_SEQUENCE_PRODUCER_ERROR

    cctx = lib.ZSTD_createCCtx()
    if not cctx:
        raise ZstdOracleError("ZSTD_createCCtx failed")
    try:
        for param, val in ((ZSTD_c_compressionLevel, level),
                           (ZSTD_c_enableSeqProducerFallback, int(fallback)),
                           (ZSTD_c_searchForExternalRepcodes,
                            ZSTD_ps_enable if search_repcodes else 0)):
            r = lib.ZSTD_CCtx_setParameter(cctx, param, val)
            if lib.ZSTD_isError(r):
                raise ZstdOracleError(
                    f"setParameter({param}) failed: "
                    f"{lib.ZSTD_getErrorName(r).decode()}")
        lib.ZSTD_registerSequenceProducer(cctx, None, cb)
        cap = lib.ZSTD_compressBound(len(data))
        dst = ctypes.create_string_buffer(cap)
        ret = lib.ZSTD_compress2(cctx, dst, cap, data, len(data))
        if lib.ZSTD_isError(ret):
            raise ZstdOracleError(
                f"compress2 failed: {lib.ZSTD_getErrorName(ret).decode()}")
        out = dst.raw[:ret]
    finally:
        lib.ZSTD_freeCCtx(cctx)
    # Per-thread stats (concurrent benchmark workers must not clobber each
    # other); the function attribute remains for single-threaded callers.
    _producer_tls.stats = calls
    compress_with_producer.last_stats = calls
    return out


_producer_tls = threading.local()


def last_producer_stats() -> dict | None:
    """Stats of this thread's most recent compress_with_producer call."""
    return getattr(_producer_tls, "stats", None)


# ---------------------------------------------------------------------------
# Streaming compression (ZSTD_compressStream2) with the producer registered.
# The reference's real deployment is the patched zstd CLI, which pumps
# ZSTD_compressStream2 (reference README.md:180-217), and its fuzz suite
# drives the producer through zstd's stream_round_trip targets
# (test/fuzzing/README.md:17-28). This is that integration shape: chunked
# input pumps, optional explicit flush points, producer called per block.

class ZstdInBuffer(ctypes.Structure):
    _fields_ = [("src", ctypes.c_void_p), ("size", ctypes.c_size_t),
                ("pos", ctypes.c_size_t)]


class ZstdOutBuffer(ctypes.Structure):
    _fields_ = [("dst", ctypes.c_void_p), ("size", ctypes.c_size_t),
                ("pos", ctypes.c_size_t)]


ZSTD_e_continue, ZSTD_e_flush, ZSTD_e_end = 0, 1, 2


@lru_cache(maxsize=1)
def _stream_lib():
    lib = _cctx_lib()
    lib.ZSTD_compressStream2.restype = ctypes.c_size_t
    lib.ZSTD_compressStream2.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ZstdOutBuffer),
        ctypes.POINTER(ZstdInBuffer), ctypes.c_int]
    lib.ZSTD_CCtx_loadDictionary.restype = ctypes.c_size_t
    lib.ZSTD_CCtx_loadDictionary.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
    return lib


def compress_stream_with_producer(data: bytes, produce, level: int = 1,
                                  fallback: bool = True,
                                  chunk_size: int = 64 << 10,
                                  flush_every: int = 0,
                                  search_repcodes: bool = False) -> bytes:
    """ZSTD_compressStream2 with `produce` registered as the external
    sequence producer: `data` is pumped in `chunk_size` pieces with
    ZSTD_e_continue, an explicit ZSTD_e_flush every `flush_every` chunks
    (0 = never), and a final ZSTD_e_end. Exercises the litLimit/window
    interactions ZSTD_compress2 never reaches (streaming blocks see
    partial windows and flush-forced block boundaries).

    `produce` has the same contract as compress_with_producer's; pass
    None to stream without a producer (stock baseline).
    """
    lib = _stream_lib()
    calls = {"blocks": 0, "errors": 0}

    @SEQPROD_CFUNC
    def cb(_state, out_seqs, cap, src, src_size, _dict, dict_size, clevel,
           wsize):
        try:
            if dict_size:  # dictionaries unsupported (src/qatseqprod.h:98)
                calls["errors"] += 1
                return ZSTD_SEQUENCE_PRODUCER_ERROR
            block = ctypes.string_at(src, src_size)
            seqs = produce(block, clevel, wsize)
            if seqs is None or len(seqs) > cap:
                calls["errors"] += 1
                return ZSTD_SEQUENCE_PRODUCER_ERROR
            for i, (off, lit, ml) in enumerate(seqs):
                out_seqs[i] = ZstdSequence(off, lit, ml, 0)
            calls["blocks"] += 1
            return len(seqs)
        except Exception:
            calls["errors"] += 1
            return ZSTD_SEQUENCE_PRODUCER_ERROR

    cctx = lib.ZSTD_createCCtx()
    if not cctx:
        raise ZstdOracleError("ZSTD_createCCtx failed")
    out = bytearray()
    try:
        for param, val in ((ZSTD_c_compressionLevel, level),
                           (ZSTD_c_enableSeqProducerFallback, int(fallback)),
                           (ZSTD_c_searchForExternalRepcodes,
                            ZSTD_ps_enable if search_repcodes else 0)):
            r = lib.ZSTD_CCtx_setParameter(cctx, param, val)
            if lib.ZSTD_isError(r):
                raise ZstdOracleError(
                    f"setParameter({param}) failed: "
                    f"{lib.ZSTD_getErrorName(r).decode()}")
        if produce is not None:
            lib.ZSTD_registerSequenceProducer(cctx, None, cb)
        obuf_cap = 1 << 17
        obuf = ctypes.create_string_buffer(obuf_cap)

        def pump(inb, mode) -> None:
            while True:
                ob = ZstdOutBuffer(ctypes.cast(obuf, ctypes.c_void_p),
                                   obuf_cap, 0)
                ret = lib.ZSTD_compressStream2(cctx, ctypes.byref(ob),
                                               ctypes.byref(inb), mode)
                if lib.ZSTD_isError(ret):
                    raise ZstdOracleError(
                        "compressStream2 failed: "
                        f"{lib.ZSTD_getErrorName(ret).decode()}")
                out.extend(obuf.raw[:ob.pos])
                if mode == ZSTD_e_continue:
                    if inb.pos == inb.size:
                        return
                elif ret == 0:  # flush/end complete
                    return

        nchunks = 0
        view = memoryview(data)
        holders = []  # keep chunk buffers alive across the pump
        for s in range(0, max(len(data), 1), chunk_size):
            chunk = bytes(view[s:s + chunk_size])
            holders.append(chunk)
            inb = ZstdInBuffer(
                ctypes.cast(ctypes.c_char_p(chunk), ctypes.c_void_p),
                len(chunk), 0)
            pump(inb, ZSTD_e_continue)
            nchunks += 1
            if flush_every and nchunks % flush_every == 0:
                pump(ZstdInBuffer(None, 0, 0), ZSTD_e_flush)
        pump(ZstdInBuffer(None, 0, 0), ZSTD_e_end)
    finally:
        lib.ZSTD_freeCCtx(cctx)
    _producer_tls.stats = calls
    compress_stream_with_producer.last_stats = calls
    return bytes(out)


def compress_with_producer_and_dict(data: bytes, produce, dictionary: bytes,
                                    level: int = 1,
                                    fallback: bool = True) -> bytes:
    """ZSTD_compress2 with BOTH a loaded dictionary and a registered
    producer — the degradation surface the reference fails fast on
    (src/qatseqprod.c:1123-1129: dict != NULL => producer error =>
    libzstd falls back). Raises ZstdOracleError if libzstd itself
    rejects the combination."""
    lib = _stream_lib()
    calls = {"blocks": 0, "errors": 0}

    @SEQPROD_CFUNC
    def cb(_state, out_seqs, cap, src, src_size, _dict, dict_size, clevel,
           wsize):
        # The reference's guard: any dictionary => producer error
        # (src/qatseqprod.c:1123-1129).
        calls["errors"] += 1
        return ZSTD_SEQUENCE_PRODUCER_ERROR

    cctx = lib.ZSTD_createCCtx()
    if not cctx:
        raise ZstdOracleError("ZSTD_createCCtx failed")
    try:
        for param, val in ((ZSTD_c_compressionLevel, level),
                           (ZSTD_c_enableSeqProducerFallback, int(fallback))):
            r = lib.ZSTD_CCtx_setParameter(cctx, param, val)
            if lib.ZSTD_isError(r):
                raise ZstdOracleError("setParameter failed")
        r = lib.ZSTD_CCtx_loadDictionary(cctx, dictionary, len(dictionary))
        if lib.ZSTD_isError(r):
            raise ZstdOracleError(
                f"loadDictionary failed: "
                f"{lib.ZSTD_getErrorName(r).decode()}")
        lib.ZSTD_registerSequenceProducer(cctx, None, cb)
        cap = lib.ZSTD_compressBound(len(data))
        dst = ctypes.create_string_buffer(cap)
        ret = lib.ZSTD_compress2(cctx, dst, cap, data, len(data))
        if lib.ZSTD_isError(ret):
            raise ZstdOracleError(
                f"compress2 failed: {lib.ZSTD_getErrorName(ret).decode()}")
        out = dst.raw[:ret]
    finally:
        lib.ZSTD_freeCCtx(cctx)
    _producer_tls.stats = calls
    return out


def decompress_with_dict(frame: bytes, dictionary: bytes,
                         expected_size: int) -> bytes:
    """DCtx decode with a loaded dictionary (for dict-mode round-trips)."""
    lib = _stream_lib()
    lib.ZSTD_createDCtx.restype = ctypes.c_void_p
    lib.ZSTD_freeDCtx.argtypes = [ctypes.c_void_p]
    lib.ZSTD_DCtx_loadDictionary.restype = ctypes.c_size_t
    lib.ZSTD_DCtx_loadDictionary.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
    lib.ZSTD_decompressDCtx.restype = ctypes.c_size_t
    lib.ZSTD_decompressDCtx.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
        ctypes.c_size_t]
    dctx = lib.ZSTD_createDCtx()
    try:
        r = lib.ZSTD_DCtx_loadDictionary(dctx, dictionary, len(dictionary))
        if lib.ZSTD_isError(r):
            raise ZstdOracleError("DCtx loadDictionary failed")
        dst = ctypes.create_string_buffer(max(expected_size, 1))
        ret = lib.ZSTD_decompressDCtx(dctx, dst, expected_size, frame,
                                      len(frame))
        if lib.ZSTD_isError(ret):
            raise ZstdOracleError(
                f"decompressDCtx failed: "
                f"{lib.ZSTD_getErrorName(ret).decode()}")
        return dst.raw[:ret]
    finally:
        lib.ZSTD_freeDCtx(dctx)
