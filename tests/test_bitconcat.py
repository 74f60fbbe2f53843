"""Differential tests: bitconcat (log-depth reduction packer) must match
bitpack (sort-based packer) and the golden BackwardBitWriter bit for bit.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from qat_zstd_plugin_tpu.ops import bitconcat, bitpack  # noqa: E402


def _ref_stream(los, his, nbs):
    """Pure-python LSB-first packing."""
    acc = 0
    pos = 0
    for lo, hi, nb in zip(los, his, nbs):
        nb = int(nb)
        v = (int(hi) << 32) | (int(lo) & 0xFFFFFFFF)
        acc |= (v & ((1 << nb) - 1)) << pos
        pos += nb
    words = []
    for i in range((pos + 31) // 32):
        words.append((acc >> (32 * i)) & 0xFFFFFFFF)
    return words, pos


@pytest.mark.parametrize("seed,S,maxbits", [(0, 64, 11), (1, 128, 11),
                                            (2, 64, 64), (3, 256, 24),
                                            (4, 100, 11)])
def test_matches_python_reference(seed, S, maxbits):
    rng = np.random.default_rng(seed)
    R = 5
    nb = rng.integers(0, maxbits + 1, (R, S)).astype(np.int32)
    nb[rng.random((R, S)) < 0.2] = 0
    lo = np.zeros((R, S), np.int64)
    hi = np.zeros((R, S), np.int64)
    for r in range(R):
        for s in range(S):
            v = int(rng.integers(0, 1 << 62)) & ((1 << int(nb[r, s])) - 1)
            lo[r, s] = v & 0xFFFFFFFF
            hi[r, s] = v >> 32
    W = (S * maxbits) // 32 + 4
    w, bits, over = bitconcat.bitconcat(
        jnp.asarray(lo.astype(np.uint32).view(np.int32)),
        jnp.asarray(hi.astype(np.uint32).view(np.int32)),
        jnp.asarray(nb), W, max_item_bits=maxbits)
    w = np.asarray(w).astype(np.uint32)
    bits = np.asarray(bits)
    assert not np.asarray(over).any()
    for r in range(R):
        ref_w, ref_bits = _ref_stream(lo[r], hi[r], nb[r])
        assert bits[r] == ref_bits
        got = w[r, :len(ref_w)].tolist()
        assert got == ref_w, r


def test_matches_bitpack():
    rng = np.random.default_rng(42)
    R, S = 8, 512
    nb = rng.integers(0, 12, (R, S)).astype(np.int32)
    lo = (rng.integers(0, 1 << 11, (R, S)) & ((1 << nb) - 1)).astype(
        np.int32)
    hi = np.zeros((R, S), np.int32)
    W = 256
    w1, b1, o1 = bitpack.bitpack(jnp.asarray(lo), jnp.asarray(hi),
                                 jnp.asarray(nb), W)
    w2, b2, o2 = bitconcat.bitconcat(jnp.asarray(lo), jnp.asarray(hi),
                                     jnp.asarray(nb), W, max_item_bits=11)
    assert (np.asarray(b1) == np.asarray(b2)).all()
    assert (np.asarray(o1) == np.asarray(o2)).all()
    nw = (np.asarray(b1).max() + 31) // 32
    assert (np.asarray(w1)[:, :nw] == np.asarray(w2)[:, :nw]).all()


def test_overflow_flag():
    R, S = 2, 8
    nb = np.full((R, S), 32, np.int32)
    lo = np.full((R, S), -1, np.int32)
    hi = np.zeros((R, S), np.int32)
    w, bits, over = bitconcat.bitconcat(jnp.asarray(lo), jnp.asarray(hi),
                                        jnp.asarray(nb), 4,
                                        max_item_bits=32)
    assert np.asarray(over).all()


def test_empty_items_skipped():
    R, S = 1, 16
    nb = np.zeros((R, S), np.int32)
    nb[0, 3] = 7
    lo = np.zeros((R, S), np.int32)
    lo[0, 3] = 0x55
    hi = np.zeros((R, S), np.int32)
    w, bits, over = bitconcat.bitconcat(jnp.asarray(lo), jnp.asarray(hi),
                                        jnp.asarray(nb), 4,
                                        max_item_bits=11)
    assert int(np.asarray(bits)[0]) == 7
    assert int(np.asarray(w)[0, 0]) == 0x55
