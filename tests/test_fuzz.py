"""Property/differential fuzz — the analog of the reference's fuzzing shim
(test/fuzzing/qatseqprodfuzzer.c wiring into zstd's 11 round-trip targets).

Seeded random exploration instead of libFuzzer: adversarial buffer shapes
(boundary sizes, structured repeats, near-incompressible), all code paths
(golden / native / device-pipeline x levels), stock zstd as the judge."""

import numpy as np
import pytest

from qat_zstd_plugin_tpu import native, oracle
from qat_zstd_plugin_tpu.golden import codec as golden_codec
from qat_zstd_plugin_tpu.runtime.stream import StreamCompressor
from qat_zstd_plugin_tpu.runtime.tpu_codec import TpuCodec

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="oracle missing")


def _gen(rng: np.random.Generator) -> bytes:
    """One adversarial buffer."""
    kind = int(rng.integers(0, 8))
    n = int(rng.choice([0, 1, 2, 3, 4, 5, 31, 32, 33, 255, 256, 1023, 1024,
                        4095, 4096, 65535, 65536, 131071, 131072, 131073,
                        200000]))
    if kind == 0:  # pure random
        return rng.integers(0, 256, n, np.uint8).tobytes()
    if kind == 1:  # single byte
        return bytes([int(rng.integers(0, 256))]) * n
    if kind == 2:  # short period
        p = rng.integers(0, 256, int(rng.integers(1, 9)), np.uint8).tobytes()
        return (p * (n // max(len(p), 1) + 1))[:n]
    if kind == 3:  # long period
        p = rng.integers(0, 256, int(rng.integers(100, 5000)),
                         np.uint8).tobytes()
        return (p * (n // max(len(p), 1) + 1))[:n]
    if kind == 4:  # text-like
        words = [b"a", b"the ", b"of ", b"zstd", b" compression", b"\n"]
        out = b""
        while len(out) < n:
            out += words[int(rng.integers(0, len(words)))]
        return out[:n]
    if kind == 5:  # runs + noise
        parts = []
        while sum(map(len, parts)) < n:
            if rng.integers(0, 2):
                parts.append(bytes([int(rng.integers(0, 4))])
                             * int(rng.integers(1, 300)))
            else:
                parts.append(rng.integers(0, 256, 50, np.uint8).tobytes())
        return b"".join(parts)[:n]
    if kind == 6:  # low-entropy bytes
        return rng.integers(0, 3, n, np.uint8).tobytes()
    # sparse: zeros with random islands
    buf = np.zeros(n, np.uint8)
    for _ in range(max(n // 500, 1)):
        i = int(rng.integers(0, max(n, 1)))
        buf[i:i + 20] = rng.integers(0, 256, len(buf[i:i + 20]), np.uint8)
    return buf.tobytes()


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_golden_roundtrip(seed):
    rng = np.random.default_rng(seed)
    for _ in range(6):
        data = _gen(rng)
        level = int(rng.integers(1, 13))
        f = golden_codec.compress(data, level=level)
        assert oracle.roundtrip_ok(f, data), (seed, level, len(data))


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
@pytest.mark.parametrize("seed", range(8, 16))
def test_fuzz_native_roundtrip(seed):
    rng = np.random.default_rng(seed)
    codec = TpuCodec(level=int(rng.integers(1, 13)), use_device=False)
    for _ in range(8):
        data = _gen(rng)
        f = codec.compress(data)
        assert oracle.roundtrip_ok(f, data), (seed, len(data))


@pytest.mark.parametrize("seed", range(16, 20))
def test_fuzz_device_pipeline_roundtrip(seed):
    rng = np.random.default_rng(seed)
    codec = TpuCodec(level=int(rng.integers(1, 13)), batch=2,
                     block_size=16384, max_seq=4096, use_device=True)
    for _ in range(3):
        data = _gen(rng)
        f = codec.compress(data, validate=True)
        assert oracle.roundtrip_ok(f, data), (seed, len(data))


@pytest.mark.parametrize("seed", range(20, 24))
def test_fuzz_stream_roundtrip(seed):
    rng = np.random.default_rng(seed)
    sc = StreamCompressor(level=int(rng.integers(1, 13)),
                          block_size=32768, use_device=False)
    chunks = [_gen(rng) for _ in range(int(rng.integers(1, 6)))]
    out = bytearray()
    for c in chunks:
        out += sc.compress(c)
    out += sc.finish()
    data = b"".join(chunks)
    assert oracle.decompress(bytes(out), len(data)) == data


def test_stream_window_covers_cross_block_offsets():
    """Regression (review find): the streaming frame header must declare
    a window covering the cross-block offsets compress_bodies can emit;
    an under-declared window decodes WRONG BYTES under streaming
    decoders while single-shot ZSTD_decompress masks it."""
    import ctypes

    import numpy as np

    from qat_zstd_plugin_tpu.runtime.stream import StreamCompressor

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, 400_000, np.uint8).tobytes()
    data = base * 2  # second copy matches at ~400K offsets (cross-block)
    sc = StreamCompressor(level=3, use_device=False)
    f = sc.compress(data) + sc.finish()

    lib = ctypes.CDLL("libzstd.so.1")

    class _Buf(ctypes.Structure):
        _fields_ = [("src", ctypes.c_void_p), ("size", ctypes.c_size_t),
                    ("pos", ctypes.c_size_t)]

    lib.ZSTD_createDStream.restype = ctypes.c_void_p
    lib.ZSTD_freeDStream.argtypes = [ctypes.c_void_p]
    lib.ZSTD_decompressStream.restype = ctypes.c_size_t
    lib.ZSTD_decompressStream.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(_Buf), ctypes.POINTER(_Buf)]
    lib.ZSTD_isError.restype = ctypes.c_uint
    lib.ZSTD_isError.argtypes = [ctypes.c_size_t]

    ds = lib.ZSTD_createDStream()
    try:
        src = ctypes.create_string_buffer(f, len(f))
        dst = ctypes.create_string_buffer(len(data) + 64)
        inb = _Buf(ctypes.cast(src, ctypes.c_void_p), len(f), 0)
        outb = _Buf(ctypes.cast(dst, ctypes.c_void_p), len(data) + 64, 0)
        while inb.pos < inb.size:
            r = lib.ZSTD_decompressStream(ds, ctypes.byref(outb),
                                          ctypes.byref(inb))
            assert not lib.ZSTD_isError(r), "streaming decode error"
            if r == 0:
                break
        assert dst.raw[:outb.pos] == data, "streaming decode mismatch"
    finally:
        lib.ZSTD_freeDStream(ds)
