"""zstd frame and block assembly (RFC 8878 §3.1.1).

The reference plugin produced only sequence arrays and let libzstd emit
frames; this framework owns the whole container:

* frame header (magic, window descriptor, frame content size, checksum flag);
* per-block choice among Raw / RLE / Compressed block types — the analog of
  the reference's `dataUncompressed` raw-block path (src/qatseqprod.c:1308);
* literals section (Raw / RLE / Huffman-compressed) + sequences section;
* optional XXH64-low32 content checksum.

Blocks are independent (window history never crosses the caller's block
boundary by construction of the matchers), mirroring the reference's
stateless sessions (src/qatseqprod.c:941, README.md:47).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import huffman, sequences as seqmod, tables
from .xxhash import content_checksum

MAGIC = 0xFD2FB528

BLOCK_RAW = 0
BLOCK_RLE = 1
BLOCK_COMPRESSED = 2

LIT_RAW = 0
LIT_RLE = 1
LIT_COMPRESSED = 2


@dataclass
class BlockSequences:
    """Sequence IR for one block (the ZSTD_Sequence contract, offsets raw)."""
    lit_lengths: np.ndarray    # literals before each match
    offsets: np.ndarray        # raw offsets >= 1
    match_lengths: np.ndarray  # >= 3
    last_literals: int         # trailing literals after the final match

    @property
    def nseq(self) -> int:
        return len(self.offsets)

    def total_span(self) -> int:
        return int(self.lit_lengths.sum() + self.match_lengths.sum()
                   + self.last_literals)


def _literals_header(lit_type: int, size_format: int, regen: int,
                     comp: int | None) -> bytes:
    if lit_type in (LIT_RAW, LIT_RLE):
        if size_format == 0:          # 5-bit size, 1 byte
            assert regen < 32
            return bytes([lit_type | (regen << 3)])
        if size_format == 1:          # 12-bit size, 2 bytes
            assert regen < 4096
            v = lit_type | (1 << 2) | (regen << 4)
            return v.to_bytes(2, "little")
        assert size_format == 3 and regen < (1 << 20)
        v = lit_type | (3 << 2) | (regen << 4)
        return v.to_bytes(3, "little")
    assert comp is not None
    if size_format == 0:              # 1 stream, 10+10 bits, 3 bytes
        assert regen < 1024 and comp < 1024
        v = lit_type | (0 << 2) | (regen << 4) | (comp << 14)
        return v.to_bytes(3, "little")
    if size_format == 1:              # 4 streams, 10+10 bits, 3 bytes
        assert regen < 1024 and comp < 1024
        v = lit_type | (1 << 2) | (regen << 4) | (comp << 14)
        return v.to_bytes(3, "little")
    if size_format == 2:              # 4 streams, 14+14 bits, 4 bytes
        assert regen < (1 << 14) and comp < (1 << 14)
        v = lit_type | (2 << 2) | (regen << 4) | (comp << 18)
        return v.to_bytes(4, "little")
    assert regen < (1 << 18) and comp < (1 << 18)
    v = lit_type | (3 << 2) | (regen << 4) | (comp << 22)
    return v.to_bytes(5, "little")


def encode_literals_section(literals: np.ndarray,
                            try_huffman: bool = True) -> bytes:
    """Literals_Section bytes: best of Raw / RLE / Huffman-compressed."""
    n = len(literals)

    def raw_section() -> bytes:
        if n < 32:
            hdr = _literals_header(LIT_RAW, 0, n, None)
        elif n < 4096:
            hdr = _literals_header(LIT_RAW, 1, n, None)
        else:
            hdr = _literals_header(LIT_RAW, 3, n, None)
        return hdr + literals.tobytes()

    if n == 0:
        return raw_section()
    if (literals == literals[0]).all():
        if n < 32:
            hdr = _literals_header(LIT_RLE, 0, n, None)
        elif n < 4096:
            hdr = _literals_header(LIT_RLE, 1, n, None)
        else:
            hdr = _literals_header(LIT_RLE, 3, n, None)
        return hdr + bytes([int(literals[0])])

    best = raw_section()
    if try_huffman and n >= 16:
        try:
            hist = np.bincount(literals, minlength=256)
            table = huffman.build_table(hist)
            tree = huffman.serialize_tree(table)
            four = n > 1023
            payload = huffman.encode_literals(literals, table, four)
            comp = len(tree) + len(payload)
            if four:
                sf = 1 if (n < 1024 and comp < 1024) else \
                     (2 if (n < (1 << 14) and comp < (1 << 14)) else 3)
            else:
                sf = 0
                if comp >= 1024:
                    raise ValueError("1-stream overflow")
            hdr = _literals_header(LIT_COMPRESSED, sf, n, comp)
            cand = hdr + tree + payload
            if len(cand) < len(best):
                best = cand
        except ValueError:
            pass
    return best


def encode_block_body(block: np.ndarray, seqs: BlockSequences,
                      allow_custom_tables: bool = True,
                      try_huffman: bool = True,
                      first_block: bool = False) -> bytes:
    """Compressed_Block content: literals section + sequences section."""
    assert seqs.total_span() == len(block), \
        f"sequences span {seqs.total_span()} != block {len(block)}"
    # Gather literal bytes: the bytes not covered by matches, in order.
    n = seqs.nseq
    lit_parts = []
    pos = 0
    for i in range(n):
        llen = int(seqs.lit_lengths[i])
        lit_parts.append(block[pos:pos + llen])
        pos += llen + int(seqs.match_lengths[i])
    lit_parts.append(block[pos:pos + seqs.last_literals])
    literals = np.concatenate(lit_parts) if lit_parts else block[:0]

    lit_sec = encode_literals_section(literals, try_huffman)
    seq_sec = seqmod.encode_sequences(
        seqs.lit_lengths, seqs.offsets, seqs.match_lengths,
        allow_custom_tables, first_block=first_block)
    return lit_sec + seq_sec


def block_header(last: bool, btype: int, size: int) -> bytes:
    assert size < (1 << 21)
    v = (1 if last else 0) | (btype << 1) | (size << 3)
    return v.to_bytes(3, "little")


def emit_block(block: np.ndarray, body: bytes | None, last: bool) -> bytes:
    """Choose Raw / RLE / Compressed for one block (the dataUncompressed
    analog: never emit a compressed body that is not strictly smaller)."""
    n = len(block)
    # RLE detection with a sampled short-circuit: the full-block equality
    # scan (compare + reduction + a block-sized bool temporary) was a
    # measured ~25% of frame assembly at 400 MB/s host speeds, and almost
    # every block fails it. The stride probe rejects non-constant blocks
    # after ~32 element compares; only blocks that pass it (constant at
    # the sampled stride) pay the exact full scan, so emitted bytes are
    # unchanged.
    if n > 0 and (block[::4096] == block[0]).all() \
            and (block == block[0]).all():
        return block_header(last, BLOCK_RLE, n) + bytes([int(block[0])])
    if body is not None and len(body) < n:
        return block_header(last, BLOCK_COMPRESSED, len(body)) + body
    return block_header(last, BLOCK_RAW, n) + block.tobytes()


def frame_header(content_size: int, window_log: int,
                 checksum: bool) -> bytes:
    out = bytearray(MAGIC.to_bytes(4, "little"))
    single_segment = False
    if content_size < 256 and (1 << window_log) >= max(content_size, 1):
        # Tiny frame: single-segment form, window = content size.
        single_segment = True
        fcs_flag = 0
    elif content_size < 65536 + 256:
        fcs_flag = 1
    elif content_size < (1 << 32):
        fcs_flag = 2
    else:
        fcs_flag = 3
    desc = (fcs_flag << 6) | ((1 << 5) if single_segment else 0) | \
        ((1 << 2) if checksum else 0)
    out.append(desc)
    if not single_segment:
        assert tables.MIN_WINDOW_LOG <= window_log <= tables.MAX_WINDOW_LOG
        out.append((window_log - 10) << 3)
    if single_segment:
        out.append(content_size)        # 1-byte FCS (required w/ single seg)
    elif fcs_flag == 1:
        out += (content_size - 256).to_bytes(2, "little")
    elif fcs_flag == 2:
        out += content_size.to_bytes(4, "little")
    else:
        out += content_size.to_bytes(8, "little")
    return bytes(out)


def assemble_frame(data: bytes | np.ndarray,
                   block_bodies: list[bytes | None],
                   block_size: int = tables.BLOCK_SIZE_MAX,
                   checksum: bool = True,
                   window_log: int | None = None) -> bytes:
    """Assemble a complete frame from per-block compressed bodies.

    block_bodies[i] is the Compressed_Block content for block i, or None to
    force Raw/RLE (the per-block fallback path, analog of the reference's
    producer-error -> libzstd-fallback, README.md:197-198).

    window_log: the stream match window the bodies' offsets may reach
    (cross-block context). None = offsets never cross block boundaries
    (the reference's per-block independence, src/qatseqprod.c:941).
    """
    buf = np.frombuffer(data, dtype=np.uint8) if not isinstance(
        data, np.ndarray) else data
    n = len(buf)
    nblocks = max(1, -(-n // block_size))
    assert len(block_bodies) == nblocks
    wneed = max(min(n, block_size), 1)
    wlog_need = (wneed - 1).bit_length() if wneed > 1 else 1
    if window_log is not None:
        # Never declare more window than the content could use.
        wlog_need = min(max(window_log, wlog_need),
                        max((n - 1).bit_length(), 1))
    window_log = min(max(wlog_need, tables.MIN_WINDOW_LOG),
                     tables.MAX_WINDOW_LOG)
    out = bytearray(frame_header(n, window_log, checksum))
    for i in range(nblocks):
        blk = buf[i * block_size:(i + 1) * block_size]
        out += emit_block(blk, block_bodies[i], last=(i == nblocks - 1))
    if checksum:
        out += content_checksum(buf).to_bytes(4, "little")
    return bytes(out)
