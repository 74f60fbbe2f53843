"""Differential decoder hardening: regression tests for the classes the
decoder fuzzer (scripts/fuzz_decoder.py) found, plus a short campaign
smoke. The golden decoder must agree with stock libzstd on every input:
same bytes, or both reject (VERDICT r4 missing-#1 — the reference links
into zstd's decompression-side fuzz family,
/root/reference/test/fuzzing/README.md:17-28)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from qat_zstd_plugin_tpu import oracle
from qat_zstd_plugin_tpu.golden import decoder
from qat_zstd_plugin_tpu.runtime.tpu_codec import TpuCodec


def _frame(data: bytes, **kw) -> bytes:
    return TpuCodec(level=1, use_device=False, block_size=16384).compress(
        data, **kw)


def test_fcs_is_enforced():
    """Finding #1: Frame_Content_Size is a promise, not a skip field."""
    f = bytearray(_frame(b"fcs check " * 200, checksum=False))
    # desc at [4]: fcs_flag in the top 2 bits; our frame uses flag 1
    # (2-byte FCS at [6:8] after the window byte). Inflate it.
    assert f[4] >> 6 == 1
    f[6] ^= 0x40
    with pytest.raises(decoder.DecodeError, match="content size"):
        decoder.decompress(bytes(f))
    if oracle.available():
        with pytest.raises(Exception):
            oracle.decompress(bytes(f), 1 << 20)


def test_skippable_size_beyond_input_rejected():
    """Finding #2: a skippable frame skipping past the end must reject,
    not silently drop trailing frames."""
    real = _frame(b"payload " * 100)
    bad = b"\x50\x2a\x4d\x18\xff\xff\x00\x00" + real
    with pytest.raises(decoder.DecodeError, match="skippable"):
        decoder.decompress(bad)
    good = b"\x50\x2a\x4d\x18\x04\x00\x00\x00abcd" + real
    assert decoder.decompress(good) == b"payload " * 100


def test_truncated_reads_reject_cleanly():
    """Finding #3: Python slices truncate silently; every read must be
    bounds-checked, and malformed input must raise DecodeError (never a
    stray IndexError)."""
    # 1-byte tail parsed as a whole block header (the fuzzer's exact find)
    with pytest.raises(decoder.DecodeError):
        decoder.decompress(bytes.fromhex("28b52ffd200001"))
    full = _frame(b"truncate me " * 400)
    for cut in (5, 7, 9, len(full) // 2, len(full) - 1):
        with pytest.raises(decoder.DecodeError):
            decoder.decompress(full[:cut])


def test_output_limit_guard():
    """max_output caps decoding (the decompression-bomb guard)."""
    data = b"\x7a" * 100000  # RLE block, 4-byte body, 100 KB output
    f = _frame(data)
    assert decoder.decompress(f) == data
    with pytest.raises(decoder.DecodeError, match="limit"):
        decoder.decompress(f, max_output=1000)


def test_reject_contract_on_garbage():
    """Any malformed input raises DecodeError, never a stray exception."""
    rng = np.random.default_rng(5)
    base = _frame(b"garble " * 500)
    for i in range(200):
        buf = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        try:
            decoder.decompress(bytes(buf), max_output=1 << 20)
        except decoder.DecodeError:
            pass  # clean reject


@pytest.mark.skipif(not oracle.available(), reason="oracle missing")
def test_fuzz_decoder_campaign_smoke(tmp_path):
    """A short timed differential campaign must come back clean."""
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "fuzz_decoder.py"),
         "8", str(tmp_path / "corpus")],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK decoder-differential" in r.stdout


def test_zero_sequence_block_trailing_garbage_rejected():
    """Review finding (r5): a compressed block whose body is
    [literals][nseq=0][junk] decoded on the golden path while stock
    rejects — the nseq==0 branch skipped the exact-consumption check."""
    from qat_zstd_plugin_tpu.format import frame as fmt_frame
    # Hand-assemble the frame: emit_block would (correctly) swap a
    # literals-only compressed body for a raw block, so splice the
    # compressed block in directly.
    lit = b"hello, zero seqs"  # < 32 bytes: 1-byte literal header form
    body = bytes([0 | (len(lit) << 3)]) + lit + b"\x00"  # raw lits + nseq=0
    junk_body = body + b"\xde\xad\xbe\xef"

    def build(b: bytes) -> bytes:
        hdr = fmt_frame.frame_header(len(lit), 10, False)
        return hdr + fmt_frame.block_header(True, fmt_frame.BLOCK_COMPRESSED,
                                            len(b)) + b

    good, bad = build(body), build(junk_body)
    assert decoder.decompress(good) == lit
    with pytest.raises(decoder.DecodeError):
        decoder.decompress(bad)
    if oracle.available():
        with pytest.raises(Exception):
            oracle.decompress(bad, len(lit))


def test_device_entropy_env_typo_fails_fast(monkeypatch):
    """Review finding (r5): a typo'd QZ_DEVICE_ENTROPY must raise, not
    silently measure the host-entropy path."""
    from qat_zstd_plugin_tpu.utils import config
    monkeypatch.setenv("QZ_DEVICE_ENTROPY", "hybird")
    config.set(None)
    try:
        with pytest.raises(ValueError, match="QZ_DEVICE_ENTROPY"):
            TpuCodec(level=1, use_device=False)
    finally:
        config.set(None)
