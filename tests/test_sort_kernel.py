"""Bitonic sort kernel: differential tests vs numpy lexsort (unsigned)."""

import numpy as np
import pytest

from qat_zstd_plugin_tpu.ops.sort_kernel import bitonic_sort


def _ref(key, pos, payloads):
    ku = key.view(np.uint32)
    order = np.lexsort((pos, ku), axis=-1)
    outs = [np.take_along_axis(a, order, 1) for a in (key, pos) + payloads]
    return outs


@pytest.mark.parametrize("n", [1024, 4096])
@pytest.mark.parametrize("seed", [0, 1])
def test_bitonic_matches_lexsort(n, seed):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    B = 2
    key = rng.integers(-2**31, 2**31, (B, n), np.int64).astype(np.int32)
    pos = np.broadcast_to(np.arange(n, dtype=np.int32)[None, :],
                          (B, n)).copy()
    w = rng.integers(0, 1 << 30, (B, n)).astype(np.int32)
    got = bitonic_sort(jnp.asarray(key), jnp.asarray(pos), jnp.asarray(w))
    ref = _ref(key, pos, (w,))
    for g, r in zip(got, ref):
        assert (np.asarray(g) == r).all()


def test_bitonic_stability_duplicates():
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    B, n = 2, 2048
    key = rng.integers(0, 17, (B, n)).astype(np.int32)  # heavy duplicates
    pos = np.broadcast_to(np.arange(n, dtype=np.int32)[None, :],
                          (B, n)).copy()
    got_k, got_p = bitonic_sort(jnp.asarray(key), jnp.asarray(pos))
    ref_k, ref_p = _ref(key, pos, ())
    assert (np.asarray(got_k) == ref_k).all()
    assert (np.asarray(got_p) == ref_p).all()
