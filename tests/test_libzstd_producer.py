"""Real libzstd sequence-producer integration (VERDICT round-1 item #3).

The reference's identity is a producer registered with stock libzstd
(ZSTD_registerSequenceProducer, src/qatseqprod.h:110-116, driven by
test/test.c:103-116). These tests drive OUR producer through the actual
libzstd ZSTD_compress2 path — the one consumer that defines the contract —
including the TPU-pipeline route, fallback semantics, and repcode search.
"""

import numpy as np
import pytest

import qat_zstd_plugin_tpu as qz
from qat_zstd_plugin_tpu import oracle


@pytest.fixture(scope="module")
def corpus():
    data = open("/root/repo/SURVEY.md", "rb").read()
    rng = np.random.default_rng(7)
    rec = rng.integers(0, 256, 96, np.uint8).tobytes()
    return (data + rec * 400 + rng.integers(0, 256, 20000, np.uint8)
            .tobytes()) * 2


def test_producer_via_libzstd_cpu(corpus):
    f = qz.compress_via_libzstd(corpus, level=1)
    stats = oracle.compress_with_producer.last_stats
    assert stats["blocks"] > 0, "producer was never called"
    assert stats["errors"] == 0
    assert oracle.decompress(f, len(corpus)) == corpus
    # Sanity: the producer path must actually compress.
    assert len(f) < 0.7 * len(corpus)


def test_producer_via_libzstd_device_route(corpus):
    """Blocks flow: libzstd -> our producer -> TPU match pipeline ->
    sequences -> libzstd entropy coding. Bit-exact round trip."""
    f = qz.compress_via_libzstd(corpus, level=1, use_device=True)
    stats = oracle.compress_with_producer.last_stats
    assert stats["blocks"] > 0
    assert stats["errors"] == 0
    assert oracle.decompress(f, len(corpus)) == corpus


def test_producer_levels_and_sizes():
    rng = np.random.default_rng(1)
    words = [b"zstd ", b"frame ", b"entropy ", b"match "]
    data = b"".join(words[i] for i in rng.integers(0, 4, 30000))
    for level in (1, 5, 9, 12):
        f = qz.compress_via_libzstd(data, level=level)
        assert oracle.decompress(f, len(data)) == data
    for n in (0, 1, 31, 1024, 131071, 131073):
        blob = bytes(rng.integers(0, 64, n, np.uint8).astype(np.uint8))
        f = qz.compress_via_libzstd(blob, level=1)
        assert oracle.decompress(f, len(blob)) == blob


def test_producer_error_falls_back(corpus):
    """A producer that always errors must still yield a valid frame via
    libzstd's software fallback (README.md:197-198 semantics)."""
    f = oracle.compress_with_producer(
        corpus, lambda *a: None, level=1, fallback=True)
    assert oracle.compress_with_producer.last_stats["errors"] > 0
    assert oracle.decompress(f, len(corpus)) == corpus


def test_search_repcodes_improves_ratio(corpus):
    """ZSTD_c_searchForExternalRepcodes (the reference benchmark's -E flag,
    test/benchmark.c:269-277): repcode post-pass should never hurt."""
    f_off = qz.compress_via_libzstd(corpus, level=1, search_repcodes=False)
    f_on = qz.compress_via_libzstd(corpus, level=1, search_repcodes=True)
    assert oracle.decompress(f_on, len(corpus)) == corpus
    assert len(f_on) <= len(f_off) + 16


def test_producer_ratio_parity_vs_stock(corpus):
    """Our sequences through libzstd entropy coding should match stock
    zstd's own matcher at the same level.

    Single-block comparison: zstd's producer ABI passes each block as an
    independent chunk with no stream history (zstd.h LIMITATIONS), so on
    multi-block inputs the producer route structurally cannot see earlier
    blocks the way stock's internal matcher does. Our own frame pipeline
    (qz.compress) does carry cross-block context; see
    test_ratio_regression.py for the multi-block parity gate."""
    one_block = corpus[:131072]
    ours = qz.compress_via_libzstd(one_block, level=1, search_repcodes=True)
    stock = oracle.compress(one_block, level=1)
    assert len(ours) <= 1.02 * len(stock)


def test_own_frame_beats_stock_on_multiblock(corpus):
    """Where the producer ABI stops (no stream history), our own frame
    path must still reach stock-zstd parity via cross-block context."""
    ours = qz.compress(corpus, level=1, use_device=False)
    assert oracle.decompress(ours, len(corpus)) == corpus
    stock = oracle.compress(corpus, level=1)
    assert len(ours) <= len(stock)
