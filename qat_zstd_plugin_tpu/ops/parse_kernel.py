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


def _make_kernel(lazy: bool):
    def kernel(mlen_ref, mnext_ref, chosen_ref, cursor_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            cursor_ref[...] = jnp.zeros_like(cursor_ref)

        base = step * mlen_ref.shape[0]

        def body(i, cur):
            t = base + i
            col = mlen_ref[i, :]
            active = cur == t
            take = active & (col >= MIN_MATCH)
            if lazy:
                take = take & ~(mnext_ref[i, :] > col)
            chosen_ref[i, :] = take.astype(jnp.int32)
            return jnp.where(take, t + col, jnp.where(active, t + 1, cur))

        cursor_ref[0, :] = jax.lax.fori_loop(
            0, mlen_ref.shape[0], body, cursor_ref[0, :])

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "lazy"))
def parse_greedy_pallas(mlen: jnp.ndarray, interpret: bool | None = None,
                        lazy: bool = False) -> jnp.ndarray:
    """Greedy parse of candidate lengths. mlen: (B, N) -> chosen (B, N) bool.

    Equivalent to match_pipeline.parse_greedy_scan (differentially tested);
    runs as a Pallas kernel on TPU, interpret mode elsewhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = mlen.shape
    chunk = min(CHUNK, N)
    assert N % chunk == 0, (N, chunk)
    mt = mlen.T  # (N, B): lanes = blocks
    mnext = jnp.concatenate(
        [mlen[:, 1:], jnp.zeros((B, 1), mlen.dtype)], axis=1).T

    grid = (N // chunk,)
    spec = pl.BlockSpec((chunk, B), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    chosen_t = pl.pallas_call(
        _make_kernel(lazy),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((chunk, B), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, B), jnp.int32)],
        interpret=interpret,
    )(mt, mnext)
    return chosen_t.T.astype(bool)
