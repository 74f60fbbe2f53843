"""Byte-verified hash matcher tests (glue_kernels.candidates_hash_verified
— the device-entropy fast-level matcher).

EXACTNESS is load-bearing here: in device-entropy mode the FSE sections
are encoded on device from these (mlen, moff) with NO host verification
pass, so a single false claim is a corrupt frame. Every claim must be a
true byte match at its full emitted length.
"""

import numpy as np
import pytest

from qat_zstd_plugin_tpu.ops import glue_kernels as gk


def _claims(block_np: np.ndarray, window: int = 32768, B: int = 8):
    import jax.numpy as jnp
    N = len(block_np)
    blocks = jnp.asarray(np.broadcast_to(block_np, (B, N)).copy())
    lengths = jnp.full((B,), N, np.int32)
    mlen, moff = gk.candidates_hash_verified(blocks, lengths,
                                             window=window)
    return np.asarray(mlen)[0], np.asarray(moff)[0]


def _assert_all_exact(block: np.ndarray, mlen, moff):
    b = block.astype(np.int64)
    N = len(b)
    ys = np.nonzero(mlen > 0)[0]
    for x in ys:
        L, o = int(mlen[x]), int(moff[x])
        assert o > 0 and x - o >= 0, (x, o)
        L = min(L, N - x)
        assert np.array_equal(b[x:x + L], b[x - o:x - o + L]), (x, o, L)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_every_claim_is_a_true_match(seed):
    rng = np.random.default_rng(seed)
    N = 32768
    # low-entropy bytes: dense collisions stress the verify path
    block = rng.integers(0, 6, N).astype(np.uint8)
    mlen, moff = _claims(block)
    assert (mlen > 0).sum() > 1000
    _assert_all_exact(block, mlen, moff)


def test_high_entropy_no_false_claims():
    rng = np.random.default_rng(7)
    N = 32768
    block = rng.integers(0, 256, N).astype(np.uint8)
    block[9000:9200] = block[2000:2200]  # one planted repeat
    mlen, moff = _claims(block)
    _assert_all_exact(block, mlen, moff)
    # the planted repeat is found at its exact offset
    assert (moff[9000:9200] == 7000).any()


def test_offset_one_runs_exact_lengths():
    rng = np.random.default_rng(3)
    N = 32768
    block = rng.integers(0, 256, N).astype(np.uint8)
    block[5000:5777] = 42  # a 777-byte run
    mlen, moff = _claims(block)
    _assert_all_exact(block, mlen, moff)
    # run interior claims are offset-1 with lengths reaching the run end
    x = 5001
    assert moff[x] == 1 and mlen[x] == 5777 - x


def test_tail_padding_never_verified():
    """Equal zero-extended tail grams must not produce claims past the
    valid length (the gp + 4 <= blen guard)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(4)
    N = 32768
    n_valid = 30000
    block = np.zeros(N, np.uint8)
    block[:n_valid] = rng.integers(1, 255, n_valid).astype(np.uint8)
    blocks = jnp.asarray(block[None, :].repeat(8, axis=0))
    lengths = jnp.full((8,), n_valid, np.int32)
    mlen, moff = gk.candidates_hash_verified(blocks, lengths,
                                             window=32768)
    mlen = np.asarray(mlen)[0]
    assert (mlen[n_valid - 3:] == 0).all()
