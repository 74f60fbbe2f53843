"""LZ4s decoder parity tests — the format contract of SURVEY §3.3."""

import numpy as np
import pytest

from qat_zstd_plugin_tpu.format import lz4s
from qat_zstd_plugin_tpu.format.lz4s import Lz4sFormatError, Sequence


def test_hand_built_stream():
    # token: 3 literals, match nibble 5 (+2 bias = 7), offset 8
    stream = bytes([0x35]) + b"abc" + bytes([8, 0])
    seqs = lz4s.decode(stream)
    assert seqs[0] == Sequence(8, 3, 7)
    # implicit empty final literals sequence, counted like the reference's
    # seqsIdx+1 return
    assert seqs[-1] == Sequence(0, 0, 0)
    assert len(seqs) == 2


def test_literal_run_accumulation():
    # zero-match token accumulates literals into the next real sequence
    # (histLiteralLen semantics, src/qatseqprod.c:1077-1084)
    # NB: zero-match tokens still carry the (ignored) 2-byte offset field —
    # the reference reads LE16 unconditionally (src/qatseqprod.c:1048).
    stream = (bytes([0x20]) + b"xy" + bytes([0, 0])  # 2 literals, match 0
              + bytes([0x13]) + b"z" + bytes([4, 0]))  # 1 lit, match 3+2
    seqs = lz4s.decode(stream)
    assert seqs[0] == Sequence(4, 3, 5)  # 2 accumulated + 1 own literals


def test_length_extensions():
    lit = bytes(range(256)) * 2  # 512 literals: nibble 15 + exts
    stream = (bytes([0xF7]) + bytes([255, 242]) + lit + bytes([2, 1])
              + bytes([0x00]))
    seqs = lz4s.decode(stream)
    assert seqs[0].lit_length == 512
    assert seqs[0].match_length == 7 + 2
    assert seqs[0].offset == 258
    assert seqs[-1] == Sequence(0, 0, 0)


def test_final_literals():
    stream = bytes([0x40]) + b"tail"
    seqs = lz4s.decode(stream)
    assert seqs == [Sequence(0, 4, 0)]


def test_roundtrip_random():
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = int(rng.integers(1, 30))
        seqs = []
        lit_total = 0
        for i in range(n - 1):
            lit = int(rng.integers(0, 40)) if rng.integers(0, 4) else \
                int(rng.integers(0, 700))
            seqs.append(Sequence(int(rng.integers(1, 65536)), lit,
                                 int(rng.integers(3, 300))))
            lit_total += lit
        final_lit = int(rng.integers(0, 50))
        seqs.append(Sequence(0, final_lit, 0))
        lit_total += final_lit
        literals = rng.integers(0, 256, lit_total, np.uint8).tobytes()
        stream = lz4s.encode(seqs, literals)
        got = lz4s.decode(stream)
        assert got == seqs


def test_truncation_errors():
    with pytest.raises(Lz4sFormatError):
        lz4s.decode(bytes([0xF0]))          # truncated lit extension
    with pytest.raises(Lz4sFormatError):
        lz4s.decode(bytes([0x50]) + b"ab")  # literals overrun
    with pytest.raises(Lz4sFormatError):
        lz4s.decode(bytes([0x03]) + bytes([7]))  # truncated offset


def test_capacity_guard():
    stream = b""
    for _ in range(5):
        stream += bytes([0x03, 1, 0])
    stream += bytes([0x00])
    with pytest.raises(Lz4sFormatError):
        lz4s.decode(stream, capacity=3)
    assert len(lz4s.decode(stream, capacity=10)) == 6


def test_native_decoder_differential():
    """The native qz_dec_lz4s must agree with the Python format contract
    on random valid streams AND reject exactly what Python rejects on
    mutated ones (the accelerator->CPU interop ABI the reference exposes
    as QZSTD_decLz4s, src/qatseqprod.c:1013-1091)."""
    from qat_zstd_plugin_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(5)
    for trial in range(40):
        # Build a valid stream via the encoder, then (half the time)
        # mutate it to exercise the error paths.
        nseq = int(rng.integers(1, 40))
        seqs = []
        lits = b""
        for _ in range(nseq - 1):
            ll = int(rng.integers(0, 40)) if rng.random() < 0.9 else \
                int(rng.integers(0, 600))
            ml = int(rng.integers(3, 50)) if rng.random() < 0.9 else \
                int(rng.integers(3, 700))
            off = int(rng.integers(1, 65536))
            seqs.append(Sequence(off, ll, ml))
            lits += bytes(rng.integers(0, 256, ll, np.uint8))
        tail = int(rng.integers(0, 50))
        seqs.append(Sequence(0, tail, 0))
        lits += bytes(rng.integers(0, 256, tail, np.uint8))
        stream = bytearray(lz4s.encode(seqs, lits))
        if trial % 2 and len(stream) > 2:
            k = int(rng.integers(1, 4))
            if k == 1:
                stream = stream[:int(rng.integers(1, len(stream)))]
            elif k == 2:
                stream[int(rng.integers(0, len(stream)))] = int(
                    rng.integers(0, 256))
            else:
                stream += bytes(rng.integers(0, 256,
                                             int(rng.integers(1, 8)),
                                             np.uint8))
        stream = bytes(stream)
        try:
            py = lz4s.decode(stream)
            py_err = False
        except Lz4sFormatError:
            py_err = True
        try:
            ll_n, of_n, ml_n = native.dec_lz4s(stream)
            nat_err = False
        except ValueError:
            nat_err = True
        assert py_err == nat_err, (trial, stream.hex())
        if not py_err:
            assert len(py) == len(ll_n)
            for i, s in enumerate(py):
                assert (s.lit_length, s.offset, s.match_length) == (
                    int(ll_n[i]), int(of_n[i]), int(ml_n[i])), (trial, i)


def test_native_decoder_capacity():
    from qat_zstd_plugin_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    seqs = [Sequence(1, 0, 3) for _ in range(10)] + [Sequence(0, 0, 0)]
    stream = lz4s.encode(seqs, b"")
    with pytest.raises(ValueError):
        native.dec_lz4s(stream, capacity=5)
    ll, of, ml = native.dec_lz4s(stream, capacity=11)
    assert len(ll) == 11
