"""Device Huffman table construction: Kraft-complete lengths + canonical
codes identical to the host assignment for the same lengths."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from qat_zstd_plugin_tpu.format import huffman  # noqa: E402
from qat_zstd_plugin_tpu.ops import huffman_tables as ht  # noqa: E402


def _host_canonical(lengths: np.ndarray):
    """Host valPerRank canonical codes for given lengths (build_table's
    step 3, factored here for the differential)."""
    present = np.nonzero(lengths)[0]
    max_bits = int(lengths[present].max())
    nb_per_rank = np.zeros(huffman.MAX_CODE_BITS + 2, np.int64)
    for s in present:
        nb_per_rank[int(lengths[s])] += 1
    val_per_rank = np.zeros(huffman.MAX_CODE_BITS + 2, np.int64)
    mn = 0
    for n in range(max_bits, 0, -1):
        val_per_rank[n] = mn
        mn += int(nb_per_rank[n])
        mn >>= 1
    codes = np.zeros(256, np.int64)
    for s in range(256):
        l = int(lengths[s])
        if l:
            codes[s] = val_per_rank[l]
            val_per_rank[l] += 1
    return codes


def _hists(rng, n):
    out = []
    for _ in range(n):
        kind = rng.integers(0, 4)
        h = np.zeros(256, np.int64)
        if kind == 0:       # text-like
            syms = rng.choice(256, 40, replace=False)
            h[syms] = rng.zipf(1.5, 40).clip(1, 50000)
        elif kind == 1:     # two symbols
            h[[3, 200]] = [5000, 17]
        elif kind == 2:     # full byte range
            h[:] = rng.integers(1, 400, 256)
        else:               # extreme skew
            h[rng.integers(0, 256)] = 100000
            h[rng.choice(256, 100, replace=False)] += 1
        out.append(h)
    return np.stack(out)


def test_device_huffman_kraft_and_canonical():
    rng = np.random.default_rng(0)
    hist = _hists(rng, 32)
    t = ht.build_tables(jnp.asarray(hist.astype(np.int32)))
    nb = np.asarray(t["nb_bits"])
    codes = np.asarray(t["codes"])
    ok = np.asarray(t["ok"])
    for b in range(len(hist)):
        present = hist[b] > 0
        if not ok[b]:
            assert present.sum() < 2
            continue
        assert (nb[b][present] >= 1).all() and \
            (nb[b][present] <= huffman.MAX_CODE_BITS).all()
        assert (nb[b][~present] == 0).all()
        kraft = sum((1 << huffman.MAX_CODE_BITS) >> int(l)
                    for l in nb[b][present])
        assert kraft == (1 << huffman.MAX_CODE_BITS), b
        assert (codes[b] == _host_canonical(nb[b])).all(), b


def test_device_huffman_cost_near_host():
    """Device heuristic lengths should cost within 3% of true Huffman."""
    rng = np.random.default_rng(1)
    hist = _hists(rng, 16)
    t = ht.build_tables(jnp.asarray(hist.astype(np.int32)))
    nb = np.asarray(t["nb_bits"])
    ok = np.asarray(t["ok"])
    for b in range(len(hist)):
        if not ok[b]:
            continue
        host = huffman.build_table(hist[b])
        host_bits = int((hist[b] * host.nb_bits).sum())
        dev_bits = int((hist[b] * nb[b]).sum())
        assert dev_bits <= host_bits * 1.03 + 64, (b, dev_bits, host_bits)
