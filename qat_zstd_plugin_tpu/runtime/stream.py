"""Streaming compression — multi-block frames fed chunk by chunk.

The reference supports `ZSTD_compressStream2` through the same block-level
producer because sessions are stateless across blocks (CPA_DC_STATELESS,
src/qatseqprod.c:941; README.md:47 "no stream history"). We inherit that
property: a stream is one zstd frame whose 128 KiB blocks are produced
independently, so resumable jobs only need a block cursor (SURVEY §5
checkpoint/resume analog) and an incremental content checksum.

Frame content size is omitted from the header (legal per RFC 8878) since
the total is unknown up front.
"""

from __future__ import annotations

import numpy as np

from .. import native
from ..format import frame, tables
from ..format.xxhash import xxh64 as py_xxh64
from .tpu_codec import TpuCodec


class _PyXxhStream:
    """Pure-python incremental XXH64 (O(1) memory: 4 accumulators plus a
    <32-byte tail, mirroring the native QzXxhState)."""

    _P1 = 11400714785074694791
    _P2 = 14029467366897019727
    _M = (1 << 64) - 1

    def __init__(self) -> None:
        p1, p2 = self._P1, self._P2
        self._acc = [(p1 + p2) & self._M, p2, 0, (-p1) & self._M]
        self._tail = b""
        self._total = 0

    @classmethod
    def _round(cls, acc: int, lane: int) -> int:
        acc = (acc + lane * cls._P2) & cls._M
        acc = ((acc << 31) | (acc >> 33)) & cls._M
        return (acc * cls._P1) & cls._M

    def update(self, data) -> None:
        buf = self._tail + bytes(data)
        self._total += len(bytes(data))
        nstripes = len(buf) // 32
        for s in range(nstripes):
            base = s * 32
            for i in range(4):
                lane = int.from_bytes(buf[base + 8 * i:base + 8 * i + 8],
                                      "little")
                self._acc[i] = self._round(self._acc[i], lane)
        self._tail = buf[nstripes * 32:]

    def digest(self) -> int:
        # Reconstruct via the one-shot golden implementation over an
        # equivalent message: feed the accumulators through the same
        # finalization path as format/xxhash.xxh64.
        from ..format.xxhash import xxh64 as _one_shot  # noqa: F401
        M = self._M
        if self._total >= 32:
            a = self._acc
            rotl = lambda x, r: ((x << r) | (x >> (64 - r))) & M  # noqa: E731
            h = (rotl(a[0], 1) + rotl(a[1], 7) + rotl(a[2], 12)
                 + rotl(a[3], 18)) & M
            P1, P2 = self._P1, self._P2
            P4 = 9650029242287828579
            for i in range(4):
                v = self._round(0, a[i])
                h = ((h ^ v) * P1 + P4) & M
        else:
            h = (2870177450012600261) & M  # seed 0 + P5
        h = (h + self._total) & M
        p = 0
        t = self._tail
        P1, P2 = self._P1, self._P2
        P3 = 1609587929392839161
        P4 = 9650029242287828579
        P5 = 2870177450012600261
        rotl = lambda x, r: ((x << r) | (x >> (64 - r))) & M  # noqa: E731
        while p + 8 <= len(t):
            k = self._round(0, int.from_bytes(t[p:p + 8], "little"))
            h = (rotl(h ^ k, 27) * P1 + P4) & M
            p += 8
        if p + 4 <= len(t):
            h = (h ^ (int.from_bytes(t[p:p + 4], "little") * P1)) & M
            h = (rotl(h, 23) * P2 + P3) & M
            p += 4
        while p < len(t):
            h = (h ^ (t[p] * P5)) & M
            h = (rotl(h, 11) * P1) & M
            p += 1
        h ^= h >> 33
        h = (h * P2) & M
        h ^= h >> 29
        h = (h * P3) & M
        h ^= h >> 32
        return h


def _stream_frame_header(window_log: int, checksum: bool) -> bytes:
    out = bytearray(frame.MAGIC.to_bytes(4, "little"))
    desc = (0 << 6) | ((1 << 2) if checksum else 0)  # no FCS, no dict
    out.append(desc)
    out.append((window_log - 10) << 3)
    return bytes(out)


class StreamCompressor:
    """Chunk-fed compressor emitting one frame; blocks ride the device
    codec in batches as they fill."""

    def __init__(self, level: int = 1, block_size: int = tables.BLOCK_SIZE_MAX,
                 checksum: bool = True, use_device: bool | None = None,
                 batch: int = 8):
        if use_device is None:
            from .device import Status, start_device
            use_device = start_device() == Status.OK
        self.codec = TpuCodec(level=level, batch=batch,
                              block_size=block_size, use_device=use_device)
        self.block_size = block_size
        self.checksum = checksum
        self._buf = bytearray()
        self._started = False
        self._finished = False
        self._hash = (native.Xxh64Stream() if native.available()
                      else _PyXxhStream()) if checksum else None
        self.blocks_emitted = 0  # the resumable block cursor

    def _header(self) -> bytes:
        # The declared window must cover the largest offset any block can
        # emit: compress_bodies gives blocks cross-block context up to
        # the level's stream window (golden LEVEL_TABLE window_log), not
        # just the block size — an under-declared window decodes wrong
        # bytes under streaming decoders (offsets past the window wrap).
        from ..golden import codec as golden_codec
        gp = golden_codec.level_params(self.codec.level)
        wlog = max(tables.MIN_WINDOW_LOG, gp.window_log)
        return _stream_frame_header(wlog, self.checksum)

    def _emit_blocks(self, data: np.ndarray, last: bool) -> bytes:
        """Compress full blocks (+ tail if last) and emit block bytes."""
        out = bytearray()
        # Reuse the batch codec to build bodies; strip its frame envelope by
        # asking for bodies directly.
        n = len(data)
        bs = self.block_size
        nblocks = max(1, -(-n // bs)) if n else (1 if last else 0)
        if n == 0 and last:
            out += frame.block_header(True, frame.BLOCK_RAW, 0)
            self.blocks_emitted += 1
            return bytes(out)
        bodies = self.codec.compress_bodies(
            data, frame_start=(self.blocks_emitted == 0))
        for i in range(nblocks):
            blk = data[i * bs:min((i + 1) * bs, n)]
            out += frame.emit_block(blk, bodies[i],
                                    last=last and i == nblocks - 1)
            self.blocks_emitted += 1
        return bytes(out)

    def compress(self, chunk: bytes) -> bytes:
        """Feed a chunk; returns any frame bytes ready to flush."""
        assert not self._finished, "stream already finished"
        out = bytearray()
        if not self._started:
            out += self._header()
            self._started = True
        self._buf += chunk
        if self._hash is not None:
            self._hash.update(chunk)
        bs = self.block_size
        nfull = len(self._buf) // bs
        if nfull:
            data = np.frombuffer(bytes(self._buf[:nfull * bs]), np.uint8)
            out += self._emit_blocks(data, last=False)
            del self._buf[:nfull * bs]
        return bytes(out)

    def finish(self) -> bytes:
        """Flush the tail block, close the frame (+ checksum)."""
        assert not self._finished
        out = bytearray()
        if not self._started:
            out += self._header()
            self._started = True
        data = np.frombuffer(bytes(self._buf), np.uint8)
        out += self._emit_blocks(data, last=True)
        self._buf.clear()
        if self._hash is not None:
            out += (self._hash.digest() & 0xFFFFFFFF).to_bytes(4, "little")
        self._finished = True
        return bytes(out)
