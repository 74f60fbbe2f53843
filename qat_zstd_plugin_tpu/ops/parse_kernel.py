"""Pallas greedy-parse kernel: the sequential LZ parse at VPU speed.

The greedy parse is the one irreducibly sequential step of LZ77 (the analog
of the byte-serial LZ4s token walk in the reference, QZSTD_decLz4s
src/qatseqprod.c:1013-1091, which is its CPU hot loop). The TPU answer is
batch-SIMD: lay the block batch B on the lane axis and sweep positions t
with per-block cursor state — every VPU lane advances one block's parse,
so the sweep costs O(N) *total* for the whole batch.

Layout: (N, B) with B on lanes (pad B to a multiple of 128 for full VPU
width). The kernel runs a 1-D grid over column chunks of T positions;
cursor state lives in VMEM scratch and persists across grid steps (TPU grid
execution is sequential), giving a single continuous scan with
double-buffered chunk DMA handled by the pallas pipeline.

The optional lazy mode defers a match when the next position holds a
strictly longer candidate (one-step lazy heuristic, matching the golden
matcher's lazy step) — the second input is the +1-shifted length column.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .match_pipeline import MIN_MATCH

CHUNK = 2048  # positions per grid step


def _make_kernel(lazy: bool, np_total: int, trunc: bool):
    def kernel(mlen_ref, mnext_ref, chosen_ref, cursor_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            cursor_ref[...] = jnp.zeros_like(cursor_ref)

        base = step * mlen_ref.shape[0]

        def body(i, cur):
            t = base + i
            col = mlen_ref[i, :]
            if trunc:
                # Parse-segmented mode: candidates may not cross the
                # segment end (each lane is an independent (block, parse
                # segment) pair; a crossing match would overlap the next
                # lane's cover). Truncation below MIN_MATCH simply drops
                # the tail match — the host extension/gap-fill passes
                # recover the bytes.
                col = jnp.minimum(col, np_total - t)
            active = cur == t
            take = active & (col >= MIN_MATCH)
            if lazy:
                take = take & ~(mnext_ref[i, :] > col)
            chosen_ref[i, :] = take.astype(jnp.int32)
            return jnp.where(take, t + col, jnp.where(active, t + 1, cur))

        cursor_ref[0, :] = jax.lax.fori_loop(
            0, mlen_ref.shape[0], body, cursor_ref[0, :])

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "lazy", "psegs"))
def parse_greedy_pallas(mlen: jnp.ndarray, interpret: bool | None = None,
                        lazy: bool = False, psegs: int = 1) -> jnp.ndarray:
    """Greedy parse of candidate lengths. mlen: (B, N) -> chosen (B, N) bool.

    Equivalent to match_pipeline.parse_greedy_scan (differentially tested);
    runs as a Pallas kernel on TPU, interpret mode elsewhere.

    psegs > 1 splits each block's position axis into psegs independent
    parse segments laid out as extra lanes: the sequential sweep shortens
    to N/psegs steps and the VPU lane axis fills to B*psegs. Candidates
    are truncated at segment ends (no cross-lane matches), which is
    ratio-free in the verified-claims flow: the host extension re-extends
    forward across the boundary and gap-fill re-matches dropped tails.
    Use only on paths whose claims are host-verified (hash matcher).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = mlen.shape
    if psegs > 1:
        assert N % psegs == 0, (N, psegs)
        mlen = mlen.reshape(B * psegs, N // psegs)
    R, Np = mlen.shape
    chunk = min(CHUNK, Np)
    assert Np % chunk == 0, (Np, chunk)
    mt = mlen.T  # (Np, R): lanes = (block, parse segment)
    mnext = jnp.concatenate(
        [mlen[:, 1:], jnp.zeros((R, 1), mlen.dtype)], axis=1).T

    grid = (Np // chunk,)
    spec = pl.BlockSpec((chunk, R), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    chosen_t = pl.pallas_call(
        _make_kernel(lazy, Np, psegs > 1),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((chunk, R), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, R), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, R), jnp.int32)],
        interpret=interpret,
    )(mt, mnext)
    chosen = chosen_t.T
    if psegs > 1:
        chosen = chosen.reshape(B, N)
    return chosen.astype(bool)
