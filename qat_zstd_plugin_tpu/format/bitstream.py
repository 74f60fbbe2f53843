"""zstd bitstream primitives.

Two flavours exist in the zstd format (RFC 8878):

* **Backward streams** (FSE-coded sequences, Huffman-coded literals): the
  encoder appends little-endian bit fields LSB-first; the stream is closed with
  a single ``1`` sentinel bit then zero-padded to a byte boundary. A decoder
  starts from the *last* byte, locates the sentinel, and reads bitfields in
  reverse append order.
* **Forward streams** (FSE table descriptions, Huffman weight headers): plain
  little-endian bitfields read in order.

The reference plugin never touches these (libzstd owned entropy coding for
it); we own them because this framework produces complete frames.
Python-golden implementation here; the C++ native runtime and the Pallas
packers mirror these semantics bit-for-bit.
"""

from __future__ import annotations


class BackwardBitWriter:
    """Accumulate LSB-first bitfields; emits the backward-read stream."""

    __slots__ = ("_acc", "_nbits", "_out")

    def __init__(self) -> None:
        self._acc = 0
        self._nbits = 0
        self._out = bytearray()

    def add(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        assert 0 <= value < (1 << nbits), (value, nbits)
        self._acc |= value << self._nbits
        self._nbits += nbits
        while self._nbits >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def add_masked(self, value: int, nbits: int) -> None:
        """Add the low `nbits` of value (value may have high garbage)."""
        self.add(value & ((1 << nbits) - 1), nbits)

    @property
    def bit_count(self) -> int:
        return len(self._out) * 8 + self._nbits

    def close(self) -> bytes:
        """Append the sentinel '1' bit, pad to byte, return the stream."""
        self.add(1, 1)
        if self._nbits:
            self._out.append(self._acc & 0xFF)
            self._acc = 0
            self._nbits = 0
        out = bytes(self._out)
        # Reset so accidental reuse is loud.
        self._out = bytearray()
        return out


class BackwardBitReader:
    """Read a backward stream (for golden-model decoding in tests)."""

    __slots__ = ("_data", "_bitpos")

    def __init__(self, data: bytes) -> None:
        if not data:
            raise ValueError("empty backward bitstream")
        last = data[-1]
        if last == 0:
            raise ValueError("corrupted stream: zero padding byte")
        sentinel = last.bit_length() - 1  # position of highest set bit
        self._data = data
        self._bitpos = (len(data) - 1) * 8 + sentinel  # bits available

    def read(self, nbits: int) -> int:
        """Read `nbits` (the field most recently... i.e. reverse append order)."""
        if nbits == 0:
            return 0
        if nbits > self._bitpos:
            raise ValueError("bitstream underflow")
        self._bitpos -= nbits
        start = self._bitpos
        # Extract bits [start, start+nbits) of the LSB-first stream.
        byte0 = start >> 3
        nbytes = (start % 8 + nbits + 7) // 8
        chunk = int.from_bytes(self._data[byte0:byte0 + nbytes], "little")
        return (chunk >> (start % 8)) & ((1 << nbits) - 1)

    @property
    def bits_remaining(self) -> int:
        return self._bitpos

    @property
    def exhausted(self) -> bool:
        return self._bitpos == 0


class ForwardBitWriter:
    """Plain LSB-first little-endian bit packer (FSE table descriptions)."""

    __slots__ = ("_acc", "_nbits", "_out")

    def __init__(self) -> None:
        self._acc = 0
        self._nbits = 0
        self._out = bytearray()

    def add(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        assert 0 <= value < (1 << nbits), (value, nbits)
        self._acc |= value << self._nbits
        self._nbits += nbits
        while self._nbits >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def close(self) -> bytes:
        """Zero-pad to byte boundary and return."""
        if self._nbits:
            self._out.append(self._acc & 0xFF)
            self._acc = 0
            self._nbits = 0
        return bytes(self._out)


class ForwardBitReader:
    __slots__ = ("_data", "_pos")

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        byte0 = self._pos >> 3
        nbytes = (self._pos % 8 + nbits + 7) // 8
        chunk = int.from_bytes(self._data[byte0:byte0 + nbytes], "little")
        val = (chunk >> (self._pos % 8)) & ((1 << nbits) - 1)
        self._pos += nbits
        return val

    def peek(self, nbits: int) -> int:
        save = self._pos
        val = self.read(nbits)
        self._pos = save
        return val

    @property
    def byte_pos(self) -> int:
        """Bytes consumed, rounded up."""
        return (self._pos + 7) // 8
