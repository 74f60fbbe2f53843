"""Property-based round-trip fuzz (hypothesis) — the generative
counterpart of the seeded suite in test_fuzz.py, mirroring the
reference's 11 libFuzzer round-trip targets (test/fuzzing/README.md):
ARBITRARY bytes, any level/path, must round-trip bit-exactly through
stock libzstd. Deadlines are disabled (first-call jit compiles)."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from qat_zstd_plugin_tpu import native, oracle
from qat_zstd_plugin_tpu.runtime.tpu_codec import TpuCodec

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="oracle missing")

_SETTINGS = dict(max_examples=40, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


def _payload():
    """Adversarial byte-string strategy: raw bytes, repeated motifs,
    runs, and binary structure."""
    raw = st.binary(min_size=0, max_size=6000)
    motif = st.builds(lambda m, k: m * k,
                      st.binary(min_size=1, max_size=96),
                      st.integers(1, 400))
    run = st.builds(lambda b, k: bytes([b]) * k,
                    st.integers(0, 255), st.integers(1, 5000))
    return st.lists(st.one_of(raw, motif, run), min_size=1, max_size=6) \
        .map(b"".join)


@settings(**_SETTINGS)
@given(data=_payload(), level=st.sampled_from([1, 3, 5, 9, 12]))
def test_software_roundtrip(data, level):
    c = TpuCodec(level=level, use_device=False)
    f = c.compress(data)
    assert oracle.decompress(f, len(data)) == data


@settings(**_SETTINGS)
@given(data=_payload(), level=st.sampled_from([1, 2, 4]))
def test_device_pipeline_roundtrip(data, level):
    """Hash-matcher device pipeline (XLA-CPU here) + verify-extend +
    gap-fill; small block size forces multi-block framing + context."""
    c = TpuCodec(level=level, batch=2, block_size=2048, use_device=True)
    f = c.compress(data)
    assert oracle.decompress(f, len(data)) == data


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=_payload())
def test_producer_via_libzstd_roundtrip(data):
    """The reference's deployment shape under generative inputs."""
    import qat_zstd_plugin_tpu as qz
    f = qz.compress_via_libzstd(data, level=1)
    assert oracle.decompress(f, len(data)) == data


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(seqs=st.lists(
    st.tuples(st.integers(0, 300), st.integers(1, 70000),
              st.integers(3, 400)), max_size=40),
    blob=st.binary(min_size=400, max_size=4000))
@pytest.mark.skipif(not native.available(), reason="native missing")
def test_extend_never_corrupts(seqs, blob):
    """Arbitrary (even nonsensical) claimed sequences through the
    verify-extend pass must yield a byte-faithful, span-complete parse."""
    from qat_zstd_plugin_tpu.format.frame import BlockSequences
    from qat_zstd_plugin_tpu.golden import matcher

    blk = np.frombuffer(blob, np.uint8)
    ll = np.array([s[0] for s in seqs], np.int64)
    of = np.array([s[1] for s in seqs], np.int64)
    ml = np.array([s[2] for s in seqs], np.int64)
    span = int(ll.sum() + ml.sum())
    if span > len(blk):
        return  # not a plausible device claim shape
    last = len(blk) - span
    ll2, of2, ml2, last2 = native.extend_sequences(blk, ll, of, ml, last)
    assert ll2.sum() + ml2.sum() + last2 == len(blk)
    matcher.validate_sequences(blk, BlockSequences(ll2, of2, ml2, last2))
