"""Hierarchical bitstream concatenation — variable-length bit packing as
a log-depth balanced reduction (no sorts, no scatters).

ops/bitpack.py solves the same problem (emit a continuous LSB-first
bitstream from per-item (value, nbits) pairs) with prefix sums + merged
rank-query sorts. That costs two multi-operand stable sorts per call —
~25-35 ms/batch at the literals shape — and the XLA sort compile at
(256, 45K) measured 10+ minutes. This module uses the natural
formulation instead:

    bitstring concatenation is ASSOCIATIVE, so packing is a balanced
    binary reduction. Level k holds G = S/2^k groups, each a bitstring
    of at most 2^k * max_item_bits bits stored as ceil-capacity
    little-endian u32 words plus a bit count. Combining neighbours is
    pure vector algebra:

      out = A | (B >>words (nbits_A >> 5) >>bits (nbits_A & 31))

    The per-group dynamic word-axis shift is emulated with log2(F)
    conditional power-of-two shifts (zero-fill roll = pad+slice, then a
    per-group select); the bit-axis shift is an elementwise variable
    shift. Zeros beyond each group's bit length make OR == ADD safe.

Everything is static-shaped elementwise/slice XLA — it fuses, runs at
HBM speed (~0.5 GB of traffic per 8 MB batch, ~1 ms), compiles in
seconds, and works identically on every backend. Differentially tested
against bitpack() and the golden BackwardBitWriter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _shr_logical(x: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.shift_right_logical(x, jnp.broadcast_to(s, x.shape))


def _word_shift(b: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """b: (R, G, F) group words; base: (R, G) word shifts >= 0.
    Returns b shifted toward higher word indices by base (zero fill)."""
    R, G, F = b.shape
    step = 1
    while step < F:
        rolled = jnp.concatenate(
            [jnp.zeros((R, G, step), b.dtype), b[:, :, : F - step]], axis=2)
        take = ((base >> step.bit_length() - 1) & 1) == 1
        b = jnp.where(take[:, :, None], rolled, b)
        step *= 2
    return b


def _combine(words: jnp.ndarray, nbits: jnp.ndarray, fout: int):
    """One doubling step: (R, G, F) + (R, G) -> (R, G/2, fout) + (R, G/2)."""
    R, G, F = words.shape
    a = words[:, 0::2, :]
    b = words[:, 1::2, :]
    nb_a = nbits[:, 0::2]
    nb_b = nbits[:, 1::2]
    if fout > F:
        pad = ((0, 0), (0, 0), (0, fout - F))
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
    elif fout < F:
        a = a[:, :, :fout]
        b = b[:, :, :fout]
    shifted = _word_shift(b, nb_a >> 5)
    sh = (nb_a & 31)[:, :, None]
    lo = shifted << sh
    prev = jnp.concatenate(
        [jnp.zeros((R, G // 2, 1), shifted.dtype), shifted[:, :, :-1]],
        axis=2)
    hi = jnp.where(sh > 0, _shr_logical(prev, (32 - sh) & 31), 0)
    return a | lo | hi, nb_a + nb_b


@functools.partial(jax.jit, static_argnames=("max_words", "max_item_bits"))
def bitconcat(lo: jnp.ndarray, hi: jnp.ndarray, nbits: jnp.ndarray,
              max_words: int, max_item_bits: int = 64):
    """Pack per-item bitfields into LSB-first u32 word streams.

    Same contract as bitpack.bitpack: lo/hi (R, S) int32 value words
    (value masked to nbits; item order == write order), nbits (R, S)
    int32 in [0, 64] (0 = skip, value must be 0). Returns
    (words (R, max_words) int32, total_bits (R,) int32,
     overflow (R,) bool).

    max_item_bits bounds any single item's nbits; tighter bounds shrink
    the early levels' word budgets (literals: 11, FSE seq items: 64).
    Item counts are padded to the next power of two internally.

    Groups whose capacity exceeds max_words are truncated mid-reduction;
    that can only corrupt streams whose true length overflows max_words,
    and those report overflow=True (callers fall back).
    """
    R, S = lo.shape
    S2 = 1 << max(1, (S - 1).bit_length())
    if S2 != S:
        pad = ((0, 0), (0, S2 - S))
        lo = jnp.pad(lo, pad)
        hi = jnp.pad(hi, pad)
        nbits = jnp.pad(nbits, pad)
        S = S2
    nb = nbits.astype(jnp.int32)
    if max_item_bits <= 32:
        words = lo.astype(jnp.int32)[:, :, None]
    else:
        words = jnp.stack([lo.astype(jnp.int32),
                           hi.astype(jnp.int32)], axis=2)
    level = 0
    while words.shape[1] > 1:
        level += 1
        need = min(((1 << level) * max_item_bits + 31) // 32 + 1,
                   max_words + 2)
        words, nb = _combine(words, nb, need)
    total_bits = nb[:, 0]
    overflow = total_bits > max_words * 32
    out = words[:, 0, :]
    if out.shape[1] < max_words:
        out = jnp.pad(out, ((0, 0), (0, max_words - out.shape[1])))
    return out[:, :max_words], total_bits, overflow
