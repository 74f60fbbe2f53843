"""Differential tests: device FSE table construction vs the host golden
(fse.build_encode_table) — same normalized counts must yield identical
state tables and per-symbol deltas, and the normalization must always be
NCount-serializable."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from qat_zstd_plugin_tpu.format import fse  # noqa: E402
from qat_zstd_plugin_tpu.ops import fse_tables  # noqa: E402


def _rand_hists(rng, k, n_blocks, total_range=(2, 5000)):
    out = []
    for _ in range(n_blocks):
        kind = rng.integers(0, 4)
        if kind == 0:   # concentrated
            h = np.zeros(k, np.int64)
            syms = rng.choice(k, size=rng.integers(2, 5), replace=False)
            for s in syms:
                h[s] = rng.integers(1, 2000)
        elif kind == 1:  # uniform-ish
            h = rng.integers(0, 50, k)
        elif kind == 2:  # geometric-ish
            h = (2000 / (1 + np.arange(k))).astype(np.int64)
            rng.shuffle(h)
        else:
            h = rng.integers(0, 3, k)
            h[rng.integers(0, k)] += rng.integers(*total_range)
        if h.sum() < 2:
            h[0] += 2
        out.append(h)
    return np.stack(out)


@pytest.mark.parametrize("kind,al,k", [("ll", 6, 36), ("of", 5, 32),
                                       ("ml", 6, 53)])
def test_normalize_valid_and_serializable(kind, al, k):
    rng = np.random.default_rng(1)
    hist = _rand_hists(rng, k, 40)
    norm = np.asarray(fse_tables.normalize(jnp.asarray(hist), al))
    for b in range(len(hist)):
        assert norm[b].sum() == 1 << al, b
        assert ((norm[b] > 0) == (hist[b] > 0)).all() or \
            (norm[b][hist[b] > 0] >= 1).all(), b
        assert (norm[b][hist[b] == 0] == 0).all(), b
        # serializable + decodable description
        desc = fse.write_ncount([int(x) for x in norm[b]], al)
        got_norm, got_al, _ = fse.read_ncount(desc, k - 1)
        assert got_al == al
        padded = list(got_norm) + [0] * (k - len(got_norm))
        assert padded[:k] == [int(x) for x in norm[b]], b


@pytest.mark.parametrize("al,k", [(6, 36), (5, 32), (6, 53)])
def test_build_tables_matches_host(al, k):
    rng = np.random.default_rng(2)
    hist = _rand_hists(rng, k, 25)
    normj = fse_tables.normalize(jnp.asarray(hist), al)
    t = fse_tables.build_tables(normj, al)
    norm = np.asarray(normj)
    st = np.asarray(t["state_table"])
    dnb = np.asarray(t["dnb"])
    dfs = np.asarray(t["dfs"])
    for b in range(len(hist)):
        ht = fse.build_encode_table([int(x) for x in norm[b]], al)
        assert st[b].tolist() == list(ht.state_table), b
        assert dnb[b].tolist() == [int(x) for x in ht.delta_nb_bits], b
        # delta_find_state only matters for present symbols
        present = norm[b] > 0
        assert (dfs[b][present] ==
                np.asarray(ht.delta_find_state)[present]).all(), b
