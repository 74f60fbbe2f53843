"""Ratio regression guard: fixed corpus, fixed configs, bounded ratios.

Bounds have headroom (~1.02x of measured) so legitimate refactors pass but
real regressions (lost matches, broken cost model, table selection bugs)
fail loudly. Measured reference points (late round 3, mixed 2MB corpus):
  device L1 27.55% (argmin-parity syncmer), device-entropy L1 28.4%,
  CPU-native L1 26.98% / L2 26.09% (fast + double-table matchers),
  stock zstd L1 27.12%.
"""

import numpy as np
import pytest

from qat_zstd_plugin_tpu import native, oracle
from qat_zstd_plugin_tpu.runtime.tpu_codec import TpuCodec


@pytest.fixture(scope="module")
def corpus():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_mod", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench.make_corpus(2 << 20)


pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="oracle missing")


def _ratio(codec, data):
    f = codec.compress(data)
    assert oracle.roundtrip_ok(f, data)
    return len(f) / len(data)


def test_device_path_l1_ratio(corpus):
    # L1 is the syncmer speed point (pair-sampled anchors, half the sort
    # volume) plus minimizer LDM plus relaxed host gap-fill (the gaps
    # hold genuinely unseen short matches); measured 0.2755 after the
    # argmin-parity selection rule (odd-shift co-selection 1/3 -> 0.40).
    r = _ratio(TpuCodec(level=1, batch=4, use_device=True), corpus)
    assert r < 0.281, r


def test_device_path_l3_ratio(corpus):
    r = _ratio(TpuCodec(level=3, batch=4, use_device=True), corpus)
    assert r < 0.270, r


def test_device_vs_stock_per_level(corpus):
    """Per-level parity gate vs stock zstd (BASELINE.md) for the device
    pipeline. Device LDM (minimizer sampling over span context) closed
    the cross-block redundancy hole, and package-merge Huffman lengths
    (optimal length-limited) recovered ~0.5% more. The r3 ladder: L1 =
    syncmer speed point (measured 1.0175x stock after relaxed gap-fill
    — the ~3.4 GB/s point),
    L2 = full-resolution anchors (1.0007x), L3-L4 BEAT stock (0.984x,
    0.971x), L5 <= 0.996x, L9 ~1.003x. Ratios are monotone down the
    ladder (the zstd level contract). The argmin-parity syncmer
    selection (odd-shift co-selection 1/3 -> 0.40 at the same sort
    volume and cost) took device L1 from 1.0175x to 1.0160x stock on
    this corpus (consistently smaller frames on every probe corpus;
    -2.1% on text)."""
    for lvl, bound in ((1, 1.02), (2, 1.015), (3, 1.0), (4, 1.0),
                       (5, 1.0), (9, 1.01)):
        ours = _ratio(TpuCodec(level=lvl, batch=4, use_device=True), corpus)
        stock = len(oracle.compress(corpus, lvl)) / len(corpus)
        assert ours <= stock * bound, (lvl, ours, stock)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_cpu_native_vs_stock_per_level(corpus):
    """The software path (cross-block context, native matcher, repcodes,
    gap-fill, package-merge Huffman) must beat stock zstd outright at
    EVERY level (measured r3 mixed corpus: L1 0.995x with the
    single-probe fast matcher — 2-way table + per-scan rep probe beat
    stock's zstd_fast, at ~4x the old chain matcher's speed — L2 0.955x
    with the double-table variant (long 8-gram probe beside the 6-gram
    table, stock's own one-level-up strategy), L3 0.974x, L5 0.992x,
    L9 0.960x, L12 <= 0.974x)."""
    for lvl, bound in ((1, 1.0), (2, 1.0), (3, 1.0), (5, 1.0), (9, 1.0),
                       (12, 1.0)):
        ours = _ratio(TpuCodec(level=lvl, use_device=False), corpus)
        stock = len(oracle.compress(corpus, lvl)) / len(corpus)
        assert ours <= stock * bound, (lvl, ours, stock)


def test_device_path_l9_ratio(corpus):
    r = _ratio(TpuCodec(level=9, batch=4, use_device=True), corpus)
    assert r < 0.270, r


def test_device_entropy_ratio(corpus):
    # Custom per-block FSE tables on device (fse_tables.py) — must stay
    # within a point of the host-entropy path (VERDICT #4 gate; was 35%
    # with predefined-only tables).
    c = TpuCodec(level=1, batch=4, use_device=True, device_entropy=True)
    r = _ratio(c, corpus)
    assert c.fallback_batches == 0
    assert r < 0.30, r


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_cpu_native_l1_ratio(corpus):
    r = _ratio(TpuCodec(level=1, use_device=False), corpus)
    assert r < 0.30, r


def test_ratio_not_absurdly_behind_stock(corpus):
    ours = _ratio(TpuCodec(level=1, batch=4, use_device=True), corpus)
    stock = len(oracle.compress(corpus, 1)) / len(corpus)
    # North-star is parity with the QAT plugin (whose entropy == stock
    # zstd's but whose matcher is a 16-bit-offset hardware LZ4s); keep us
    # within 10% of stock zstd software as a strong proxy bound.
    assert ours < stock * 1.10, (ours, stock)
