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
    """Pure-python fallback incremental checksum (buffers; fine for tests)."""

    def __init__(self) -> None:
        self._parts: list[bytes] = []

    def update(self, data) -> None:
        self._parts.append(bytes(data))

    def digest(self) -> int:
        return py_xxh64(b"".join(self._parts), 0)


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
        wlog = max(tables.MIN_WINDOW_LOG,
                   min(17, (self.block_size - 1).bit_length()))
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
        bodies = self.codec.compress_bodies(data)
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
