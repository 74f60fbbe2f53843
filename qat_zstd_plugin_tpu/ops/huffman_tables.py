"""Per-block Huffman table construction on device (literals entropy).

Vectorized over the block batch: byte histograms -> length-limited code
lengths (max 11 bits, Kraft-complete) -> canonical code values matching
the host's valPerRank assignment (format/huffman.py build_table), so the
host can serialize the weights and any conforming decoder rebuilds the
exact codes the device used.

Unlike the host's heap-built Huffman, lengths start from rounded
-log2(p) and are repaired to a complete Kraft sum with rank-ordered
vectorized passes — any complete length assignment is a VALID code (the
decoder derives everything from the weights); the tiny optimality loss
vs true Huffman is the price of a batch-vectorized build.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_BITS = 11
UNIT = 1 << MAX_BITS


def _rank_desc(key: jnp.ndarray) -> jnp.ndarray:
    """rank[i] = #(j) with (key[j], j) > (key[i], i); (B, K) int32."""
    B, K = key.shape
    j_idx = jnp.arange(K, dtype=jnp.int32)
    kj = key[:, None, :]
    ki = key[:, :, None]
    gt = (kj > ki) | ((kj == ki) & (j_idx[None, None, :]
                                   < j_idx[None, :, None]))
    return gt.sum(axis=2).astype(jnp.int32)


def build_tables(hist: jnp.ndarray):
    """hist: (B, 256) int32 -> dict with
      nb_bits (B, 256): code length per symbol (0 = absent)
      codes   (B, 256): canonical code values
      max_bits (B,), last_symbol (B,),
      ok (B,): >= 2 present symbols (else caller uses raw/RLE literals)
    """
    B, K = hist.shape
    present = hist > 0
    npresent = present.sum(axis=1)
    ok = npresent >= 2
    total = jnp.maximum(hist.sum(axis=1, keepdims=True), 1)

    # Initial lengths ~ -log2(p), clamped to [1, MAX_BITS].
    p = hist.astype(jnp.float32) / total.astype(jnp.float32)
    l0 = jnp.ceil(-jnp.log2(jnp.maximum(p, 1e-9))).astype(jnp.int32)
    lengths = jnp.where(present, jnp.clip(l0, 1, MAX_BITS), 0)

    def kraft(ln):
        return jnp.where(present, UNIT >> jnp.clip(ln, 0, MAX_BITS),
                         0).sum(axis=1)

    # Over-subscribed: lengthen least-frequent symbols (largest combined
    # gain first would distort; host lengthens by ascending frequency).
    # Vectorized: in ascending-hist rank order, lengthen the prefix whose
    # cumulative gain covers the excess; iterate until K <= UNIT.
    def over_body(state):
        ln, = state
        excess = kraft(ln) - UNIT                       # (B,)
        can = present & (ln < MAX_BITS)
        gain = jnp.where(can, UNIT >> (ln + 1), 0)      # halves the term
        order = _rank_desc(jnp.where(can, -hist, -(1 << 30)))
        # gains in ascending-hist rank order via one-hot permutation
        oh = order[:, :, None] == jnp.arange(K, dtype=jnp.int32)
        g_sorted = (oh * gain[:, :, None]).sum(axis=1)  # (B, K) by rank
        cum = jnp.cumsum(g_sorted, axis=1)
        # lengthen symbols whose rank-prefix cumulative (exclusive) is
        # still below the excess
        cum_excl = cum - g_sorted
        take_sorted = (cum_excl < excess[:, None]) & (g_sorted > 0)
        take = (oh & take_sorted[:, None, :]).any(axis=2)
        return (jnp.where(take, ln + 1, ln),)

    def over_cond(state):
        return (kraft(state[0]) > UNIT).any()

    lengths, = jax.lax.while_loop(over_cond, over_body, (lengths,))

    # Under-subscribed: shorten most-frequent symbols whose gain fits the
    # remaining gap, largest-frequency first (host order), iteratively.
    def under_body(state):
        ln, = state
        gap = UNIT - kraft(ln)                          # (B,) >= 0
        can = present & (ln > 1)
        gain = jnp.where(can, UNIT >> ln, 0)            # adds this much
        order = _rank_desc(jnp.where(can, hist, -(1 << 30)))
        oh = order[:, :, None] == jnp.arange(K, dtype=jnp.int32)
        g_sorted = (oh * gain[:, :, None]).sum(axis=1)
        cum = jnp.cumsum(g_sorted, axis=1)
        cum_excl = cum - g_sorted
        # shorten the rank-prefix that fits entirely inside the gap
        take_sorted = (cum <= gap[:, None]) & (g_sorted > 0)
        # ensure progress: if none fits as a prefix but some single gain
        # fits, take the first fitting one
        any_prefix = take_sorted.any(axis=1)
        fit_single = (g_sorted <= gap[:, None]) & (g_sorted > 0)
        first_fit = (jnp.cumsum(fit_single.astype(jnp.int32), axis=1)
                     == 1) & fit_single
        take_sorted = jnp.where(any_prefix[:, None], take_sorted,
                                first_fit)
        take = (oh & take_sorted[:, None, :]).any(axis=2)
        return (jnp.where(take, ln - 1, ln),)

    def under_cond(state):
        ln, = state
        gap = UNIT - kraft(ln)
        can_gain = jnp.where(present & (ln > 1), UNIT >> ln, 0)
        fixable = (can_gain <= gap[:, None]) & (can_gain > 0)
        return ((gap > 0) & fixable.any(axis=1)).any()

    lengths, = jax.lax.while_loop(under_cond, under_body, (lengths,))

    max_bits = lengths.max(axis=1)
    sym = jnp.arange(K, dtype=jnp.int32)
    last_symbol = jnp.where(present, sym[None, :], -1).max(axis=1)

    # Canonical codes: valPerRank descending from MAX_BITS (extra ranks
    # hold zero counts, so starting above max_bits is a no-op), then
    # within a length, codes ascend by symbol.
    nb_per_rank = (lengths[:, :, None]
                   == jnp.arange(1, MAX_BITS + 1)[None, None, :]) \
        .sum(axis=1).astype(jnp.int32)                   # (B, 11): len 1..11

    def vpr_body(n_rev, carry):
        mn, vals = carry
        n = MAX_BITS - n_rev                              # 11..1
        vals = vals.at[:, n - 1].set(mn)
        mn = (mn + nb_per_rank[:, n - 1]) >> 1
        return (mn, vals)

    mn0 = jnp.zeros((B,), jnp.int32)
    vals0 = jnp.zeros((B, MAX_BITS), jnp.int32)
    _, val_per_rank = jax.lax.fori_loop(
        0, MAX_BITS, lambda i, c: vpr_body(i, c), (mn0, vals0))

    same_len = (lengths[:, None, :] == lengths[:, :, None]) \
        & present[:, None, :] & (sym[None, None, :] < sym[None, :, None])
    rank_in_len = same_len.sum(axis=2).astype(jnp.int32)
    base = jnp.take_along_axis(
        jnp.pad(val_per_rank, ((0, 0), (1, 0))),  # index 0 for absent
        jnp.clip(lengths, 0, MAX_BITS), axis=1)
    codes = jnp.where(present, base + rank_in_len, 0)
    return {"nb_bits": lengths, "codes": codes, "max_bits": max_bits,
            "last_symbol": last_symbol, "ok": ok}
