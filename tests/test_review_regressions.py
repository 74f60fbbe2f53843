"""Regression tests for the round-1 self-review findings (all reproduced
bugs; see the fix commit for the full list)."""

import numpy as np
import pytest

from qat_zstd_plugin_tpu import native, oracle
from qat_zstd_plugin_tpu.format import fse as fsemod
from qat_zstd_plugin_tpu.golden import decoder
from qat_zstd_plugin_tpu.runtime.tpu_codec import TpuCodec


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_extend_sequences_dropped_tail_span():
    """Extension swallowing the final sequence must fold its bytes into
    last_literals (was: span under-covered the block -> silent raw)."""
    blk = np.frombuffer(b"ABCDEFGH" * 4 + b"zzzz", np.uint8)
    ll, of, ml, lastlit = native.extend_sequences(
        blk, np.array([8, 6]), np.array([8, 8]), np.array([16, 4]), 0)
    assert int(ll.sum() + ml.sum()) + lastlit == len(blk)


@pytest.mark.skipif(not oracle.available(), reason="oracle missing")
def test_device_entropy_without_native_is_valid(monkeypatch):
    """Placeholder offsets must never reach the Python entropy path
    (was: silent corrupt frames when the native runtime is absent)."""
    monkeypatch.setattr(native, "available", lambda: False)
    c = TpuCodec(level=1, batch=2, block_size=2048, max_seq=512,
                 use_device=True, device_entropy=True)
    data = (b"hello world foo bar " * 500)[:8192]
    f = c.compress(data)
    assert oracle.roundtrip_ok(f, data)


@pytest.mark.skipif(not oracle.available(), reason="oracle missing")
def test_small_block_size_uses_device():
    """block_size < max_seq must not crash compact (was: broadcast error
    -> permanent CPU fallback)."""
    c = TpuCodec(level=1, batch=2, block_size=2048, max_seq=16384,
                 use_device=True)
    data = (b"abcabcabc" * 1000)[:6000]
    f = c.compress(data)
    assert oracle.roundtrip_ok(f, data)
    assert c.fallback_batches == 0


def test_decoder_weight_stream_bounded():
    """Zero-bit FSE state cycles must terminate (was: infinite loop)."""
    desc = fsemod.write_ncount([32], 5)
    payload = bytes([len(desc) + 4]) + desc + b"\xaa\xbb\xcc\x81"
    with pytest.raises(decoder.DecodeError, match="terminate"):
        decoder._read_huffman_weights(payload)


@pytest.mark.skipif(not oracle.available(), reason="oracle missing")
def test_oracle_decodes_high_ratio_nofcs_frames():
    """No-FCS frames beyond the 64x guess must decode (was: one-shot
    buffer -> 'Destination buffer is too small')."""
    from qat_zstd_plugin_tpu.runtime.stream import StreamCompressor
    sc = StreamCompressor(level=1, use_device=False)
    data = b"\x00" * (8 << 20)
    f = sc.compress(data) + sc.finish()
    assert oracle.decompress(bytes(f)) == data


def test_streaming_pyxxh_matches_oneshot():
    from qat_zstd_plugin_tpu.format.xxhash import xxh64
    from qat_zstd_plugin_tpu.runtime.stream import _PyXxhStream
    rng = np.random.default_rng(0)
    msg = rng.integers(0, 256, 100_001, np.uint8).tobytes()
    h = _PyXxhStream()
    for i in range(0, len(msg), 7777):
        h.update(msg[i:i + 7777])
    assert h.digest() == xxh64(msg)


def test_benchmark_thread_failure_does_not_deadlock(tmp_path, monkeypatch):
    from qat_zstd_plugin_tpu.tools import benchmark
    p = tmp_path / "d.bin"
    p.write_bytes(b"data" * 5000)
    monkeypatch.setattr(benchmark.oracle, "compress",
                        lambda *a, **k: (_ for _ in ()).throw(
                            RuntimeError("boom")))
    rc = benchmark.run([str(p), "-t", "3", "-m", "2"])
    assert rc == 1  # clean FAIL, not a hang
