"""Native host runtime bindings (ctypes over libqz_entropy.so).

Auto-builds with g++ on first import if the shared object is missing or
stale. Falls back cleanly (available() == False) when no toolchain exists;
callers then use the Python golden model — the same graceful-degradation
posture as the reference's device-unavailable path."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libqz_entropy.so")
_SRC = os.path.join(_DIR, "qz_entropy.cc")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["sh", os.path.join(_DIR, "build.sh")], check=True,
                       capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # QZ_NATIVE_LIB points at an alternate build (e.g. the ASan/UBSan
    # library from build.sh asan, loaded under LD_PRELOAD=libasan).
    so = os.environ.get("QZ_NATIVE_LIB", _SO)
    stale = so == _SO and (not os.path.exists(_SO)
                           or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
    if stale and not _build():
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.qz_xxh64.restype = ctypes.c_uint64
    lib.qz_xxh64.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                             ctypes.c_uint64]
    lib.qz_block_body.restype = ctypes.c_size_t
    lib.qz_block_body.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t,   # block
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # seq arrays
        ctypes.c_size_t, ctypes.c_uint32,   # nseq, last_literals
        ctypes.c_int, ctypes.c_int,         # allow_custom, try_huffman
        ctypes.c_int,                       # first_block (frame rep init)
        ctypes.c_void_p, ctypes.c_size_t]   # dst, cap
    lib.qz_find_sequences.restype = ctypes.c_size_t
    lib.qz_find_sequences.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p]
    lib.qz_find_sequences_hinted.restype = ctypes.c_size_t
    lib.qz_find_sequences_hinted.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_void_p]
    lib.qz_block_body_external_seqsec.restype = ctypes.c_size_t
    lib.qz_block_body_external_seqsec.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_size_t, ctypes.c_uint32, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_size_t]
    lib.qz_extend_sequences.restype = ctypes.c_size_t
    lib.qz_extend_sequences.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
        ctypes.c_size_t]
    lib.qz_fill_gaps.restype = ctypes.c_size_t
    lib.qz_fill_gaps.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
        ctypes.c_size_t, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.qz_compress_blocks_mt.restype = None
    lib.qz_compress_blocks_mt.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_size_t,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.qz_dec_lz4s.restype = ctypes.c_size_t
    lib.qz_dec_lz4s.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_size_t]
    lib.qz_xxh64_state_size.restype = ctypes.c_size_t
    lib.qz_xxh64_init.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.qz_xxh64_update.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_size_t]
    lib.qz_xxh64_digest.restype = ctypes.c_uint64
    lib.qz_xxh64_digest.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


class Xxh64Stream:
    """Incremental XXH64 over the native runtime."""

    def __init__(self, seed: int = 0):
        lib = _load()
        assert lib is not None
        self._lib = lib
        self._state = ctypes.create_string_buffer(
            lib.qz_xxh64_state_size())
        lib.qz_xxh64_init(self._state, seed)

    def update(self, data) -> None:
        if isinstance(data, np.ndarray):
            arr = np.ascontiguousarray(data, np.uint8)
            self._lib.qz_xxh64_update(self._state, arr.ctypes.data, arr.size)
        else:
            self._lib.qz_xxh64_update(self._state, data, len(data))

    def digest(self) -> int:
        return int(self._lib.qz_xxh64_digest(self._state))


def available() -> bool:
    return _load() is not None


def xxh64(data, seed: int = 0) -> int:
    """XXH64 over bytes or a uint8 numpy array (zero-copy for arrays)."""
    lib = _load()
    assert lib is not None
    if isinstance(data, np.ndarray):
        arr = np.ascontiguousarray(data, np.uint8)
        return int(lib.qz_xxh64(arr.ctypes.data, arr.size, seed))
    return int(lib.qz_xxh64(data, len(data), seed))


def block_body(block: np.ndarray, lit_lens: np.ndarray, offsets: np.ndarray,
               match_lens: np.ndarray, last_literals: int,
               allow_custom: bool = True, try_huffman: bool = True,
               first_block: bool = False) -> bytes | None:
    """Compressed block body from sequences; None -> caller emits raw."""
    lib = _load()
    assert lib is not None
    block = np.ascontiguousarray(block, np.uint8)
    ll = np.ascontiguousarray(lit_lens, np.uint32)
    of = np.ascontiguousarray(offsets, np.uint32)
    ml = np.ascontiguousarray(match_lens, np.uint32)
    cap = len(block) + 512
    dst = np.empty(cap, np.uint8)
    n = lib.qz_block_body(
        block.ctypes.data, len(block), ll.ctypes.data, of.ctypes.data,
        ml.ctypes.data, len(ll), last_literals, int(allow_custom),
        int(try_huffman), int(first_block), dst.ctypes.data, cap)
    if n == 0:
        return None
    return dst[:n].tobytes()


def find_sequences_hinted(block: np.ndarray, chain_depth: int, lazy: bool,
                          hint_pos: np.ndarray, hint_len: np.ndarray,
                          hint_off: np.ndarray,
                          cap: int | None = None, ctx_len: int = 0,
                          mml: int = 4):
    """Chain matcher with device-candidate hints competing inside the
    parse (see qz_find_sequences_hinted). hint_pos is block-relative
    ascending match starts, hint_len the claim spans (a claim sources
    every position inside its span), hint_off the device's source
    distances. Returns (lit, off, ml, last_literals)."""
    lib = _load()
    assert lib is not None
    block = np.ascontiguousarray(block, np.uint8)
    hp = np.ascontiguousarray(hint_pos, np.uint32)
    hl = np.ascontiguousarray(hint_len, np.uint32)
    ho = np.ascontiguousarray(hint_off, np.uint32)
    n = len(block) - ctx_len
    if cap is None:
        cap = max(16, n // 3 + 2)
    ll = np.empty(cap, np.uint32)
    of = np.empty(cap, np.uint32)
    ml = np.empty(cap, np.uint32)
    lastlit = ctypes.c_uint32(0)
    got = lib.qz_find_sequences_hinted(
        block.ctypes.data, ctx_len, n, chain_depth, int(lazy), mml,
        hp.ctypes.data, hl.ctypes.data, ho.ctypes.data, len(hp),
        ll.ctypes.data, of.ctypes.data, ml.ctypes.data, cap,
        ctypes.byref(lastlit))
    if got == ctypes.c_size_t(-1).value:
        raise OverflowError("sequence capacity exceeded")
    return (ll[:got].astype(np.int64), of[:got].astype(np.int64),
            ml[:got].astype(np.int64), int(lastlit.value))


def compress_blocks_mt(buf: np.ndarray, block_size: int, chain_depth: int,
                       lazy: bool, allow_custom: bool = True,
                       try_huffman: bool = True, window_log: int = 0,
                       mml: int = 4, nthreads: int = 0,
                       frame_start: bool = True) -> list[bytes | None]:
    """Match + extend + entropy for every block of `buf` in one native
    call with an internal thread pool. None entries => emit raw.
    window_log > 0 enables cross-block window context (offsets reach back
    up to 1 << window_log into earlier blocks' raw bytes)."""
    import os
    lib = _load()
    assert lib is not None
    buf = np.ascontiguousarray(buf, np.uint8)
    n = len(buf)
    nblocks = max(1, -(-n // block_size))
    if nthreads <= 0:
        nthreads = os.cpu_count() or 1
    arena = np.empty(nblocks * block_size, np.uint8)
    sizes = np.zeros(nblocks, np.uint32)
    lib.qz_compress_blocks_mt(
        buf.ctypes.data, n, block_size, chain_depth, int(lazy), mml,
        int(allow_custom), int(try_huffman), window_log, nthreads,
        int(frame_start), arena.ctypes.data, sizes.ctypes.data)
    out: list[bytes | None] = []
    for i in range(nblocks):
        sz = int(sizes[i])
        out.append(arena[i * block_size:i * block_size + sz].tobytes()
                   if sz else None)
    return out


def block_body_external_seqsec(block: np.ndarray, lit_lens: np.ndarray,
                               match_lens: np.ndarray, last_literals: int,
                               seq_section: bytes,
                               try_huffman: bool = True) -> bytes | None:
    """Body = host literals section + device-produced sequences section."""
    lib = _load()
    assert lib is not None
    block = np.ascontiguousarray(block, np.uint8)
    ll = np.ascontiguousarray(lit_lens, np.uint32)
    ml = np.ascontiguousarray(match_lens, np.uint32)
    cap = len(block) + 512 + len(seq_section)
    dst = np.empty(cap, np.uint8)
    n = lib.qz_block_body_external_seqsec(
        block.ctypes.data, len(block), ll.ctypes.data, ml.ctypes.data,
        len(ll), last_literals, seq_section, len(seq_section),
        int(try_huffman), dst.ctypes.data, cap)
    if n == 0:
        return None
    return dst[:n].tobytes()


def extend_sequences(block: np.ndarray, lit: np.ndarray, off: np.ndarray,
                     ml: np.ndarray, last_literals: int,
                     ctx_len: int = 0, max_off: int = 0):
    """Re-extend capped matches with real byte compares (see
    qz_extend_sequences). `block` may carry ctx_len bytes of window
    context at the front; the sequences cover only the trailing block.
    max_off caps offsets the SLIDE probe may synthesize (the frame
    window; 0 = unlimited — claim/rep offsets are already caller-legal).
    Returns (lit, off, ml, last_literals)."""
    lib = _load()
    assert lib is not None
    block = np.ascontiguousarray(block, np.uint8)
    ll = np.ascontiguousarray(lit, np.uint32)
    of = np.ascontiguousarray(off, np.uint32)
    mm = np.ascontiguousarray(ml, np.uint32)
    lastlit = ctypes.c_uint32(last_literals)
    # The C pass only shrinks/merges; arrays are modified in place.
    new_n = lib.qz_extend_sequences(
        block.ctypes.data, ctx_len, len(block) - ctx_len, ll.ctypes.data,
        of.ctypes.data, mm.ctypes.data, len(ll), ctypes.byref(lastlit),
        max_off)
    return (ll[:new_n].astype(np.int64), of[:new_n].astype(np.int64),
            mm[:new_n].astype(np.int64), int(lastlit.value))


def fill_gaps(block: np.ndarray, lit: np.ndarray, off: np.ndarray,
              ml: np.ndarray, last_literals: int, ctx_len: int = 0,
              chain_depth: int = 8, mml: int = 6, min_gap: int = 32,
              relaxed: bool = False):
    """Re-match long literal runs against the cross-block window context
    (see qz_fill_gaps). `block` = ctx_len context bytes + the block.
    relaxed=True swaps in the extension walk's cost model (for the
    syncmer device path, whose gaps hold genuinely unseen short
    matches). Returns (lit, off, ml, last_literals)."""
    lib = _load()
    assert lib is not None
    block = np.ascontiguousarray(block, np.uint8)
    n = len(block) - ctx_len
    cap = max(64, len(lit) + n // 8 + 8)
    ll = np.zeros(cap, np.uint32)
    of = np.zeros(cap, np.uint32)
    mm = np.zeros(cap, np.uint32)
    ll[:len(lit)] = lit
    of[:len(off)] = off
    mm[:len(ml)] = ml
    lastlit = ctypes.c_uint32(last_literals)
    new_n = lib.qz_fill_gaps(
        block.ctypes.data, ctx_len, n, ll.ctypes.data, of.ctypes.data,
        mm.ctypes.data, len(lit), ctypes.byref(lastlit), cap, chain_depth,
        mml, min_gap, int(relaxed))
    if new_n == ctypes.c_size_t(-1).value:
        return (np.asarray(lit), np.asarray(off), np.asarray(ml),
                last_literals)  # overflow: keep the original parse
    return (ll[:new_n].astype(np.int64), of[:new_n].astype(np.int64),
            mm[:new_n].astype(np.int64), int(lastlit.value))


def dec_lz4s(stream: bytes | np.ndarray, capacity: int | None = None):
    """Decode an LZ4s token stream into (lit, off, ml) claim arrays —
    the native analog of the reference's QZSTD_decLz4s (the
    accelerator->CPU interop surface; format contract pinned by
    format/lz4s.py, byte-identical by differential test). Raises
    ValueError on malformed streams or capacity overflow."""
    lib = _load()
    assert lib is not None
    arr = (np.ascontiguousarray(stream, np.uint8)
           if isinstance(stream, np.ndarray)
           else np.frombuffer(stream, np.uint8))
    n = len(arr)
    cap = capacity if capacity is not None else n + 16
    ll = np.empty(cap, np.uint32)
    of = np.empty(cap, np.uint32)
    ml = np.empty(cap, np.uint32)
    got = lib.qz_dec_lz4s(arr.ctypes.data, n, ll.ctypes.data,
                          of.ctypes.data, ml.ctypes.data, cap)
    if got == ctypes.c_size_t(-1).value:
        raise ValueError("malformed LZ4s stream or capacity exceeded")
    return (ll[:got].astype(np.int64), of[:got].astype(np.int64),
            ml[:got].astype(np.int64))


def find_sequences(block: np.ndarray, chain_depth: int, lazy: bool,
                   cap: int | None = None, ctx_len: int = 0,
                   mml: int = 4):
    """Native hash-chain matcher. `block` = ctx_len context bytes + the
    block itself; matches may reference the context (cross-block window).
    Returns (lit, off, ml, last_literals) covering the block only."""
    lib = _load()
    assert lib is not None
    block = np.ascontiguousarray(block, np.uint8)
    n = len(block) - ctx_len
    if cap is None:
        cap = max(16, n // 3 + 2)
    ll = np.empty(cap, np.uint32)
    of = np.empty(cap, np.uint32)
    ml = np.empty(cap, np.uint32)
    lastlit = ctypes.c_uint32(0)
    got = lib.qz_find_sequences(
        block.ctypes.data, ctx_len, n, chain_depth, int(lazy), mml,
        ll.ctypes.data, of.ctypes.data, ml.ctypes.data, cap,
        ctypes.byref(lastlit))
    if got == ctypes.c_size_t(-1).value:
        raise OverflowError("sequence capacity exceeded")
    return (ll[:got].astype(np.int64), of[:got].astype(np.int64),
            ml[:got].astype(np.int64), int(lastlit.value))
