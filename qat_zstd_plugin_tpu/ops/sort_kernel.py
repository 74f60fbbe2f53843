"""Pallas VMEM-resident bitonic sort (measured: parity with XLA's sort,
not a win — XLA's single-operand sort fast path, exploited by
ops/glue_kernels.py, beats both by ~3-8x; this kernel is retained as the
tested reference implementation of the in-VMEM network approach).

On TPU, sorting IS the scatter/gather/hash-table of this codec (see
match_pipeline.py): candidates come from a stable gram sort, un-sorting is
a permutation sort, compaction is a mask sort. XLA's HLO sort runs its
O(log^2 N) compare-exchange stages through HBM, costing ~150 round trips
of the full operand set; this kernel keeps one block's arrays resident in
VMEM for the whole network, turning the sort from HBM-bound into VPU-bound.

Layout: a block's N = R*128 elements sit in an (R, 128) tile, element
i = r*128 + l. Compare-exchange partners are i ^ s:
  * s >= 128: partner lives s/128 rows away, same lane — sublane-axis
    roll + select;
  * s < 128: partner is another lane of the same row — lane-axis roll +
    select (the circularly wrapped values land only at lanes that select
    the other roll direction, so butterflies are exact).

Stability: bitonic networks are unstable, so comparison is lexicographic
on (key, pos) — equal keys order by position, which is exactly the
"hash chain in position order" property the candidate stage needs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SIGN = -0x80000000  # python int: folded as an immediate, not a captured array


def _compare_exchange(arrs, idx, k: int, j: int):
    """One bitonic stage over (R, 128) arrays; arrs[0:2] are the key pair."""
    has_bit = (idx & j) != 0           # this slot is the upper partner
    descending = (idx & k) != 0        # direction of this run
    partners = []
    rows = arrs[0].shape[0]
    for a in arrs:
        if j >= LANES:
            shift = j // LANES
            down = pltpu.roll(a, rows - shift, axis=0)  # value from r+shift
            up = pltpu.roll(a, shift, axis=0)           # value from r-shift
        else:
            down = pltpu.roll(a, LANES - j, axis=1)
            up = pltpu.roll(a, j, axis=1)
        partners.append(jnp.where(has_bit, up, down))
    ak, ap = arrs[0], arrs[1]
    pk, pp = partners[0], partners[1]
    a_less = (ak < pk) | ((ak == pk) & (ap < pp))
    a_greater = (ak > pk) | ((ak == pk) & (ap > pp))
    want_high = has_bit ^ descending   # this slot should hold the larger
    # (bool-select of bools hits an unsupported i8->i1 trunc in Mosaic;
    # express as logical ops instead.)
    out_of_place = (want_high & a_less) | (~want_high & a_greater)
    return [jnp.where(out_of_place, p, a) for a, p in zip(arrs, partners)]


def _make_kernel(n_arrays: int, rows: int):
    N = rows * LANES

    def kernel(*refs):
        ins = refs[:n_arrays]
        outs = refs[n_arrays:]
        row_id = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
        lane_id = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        idx = row_id * LANES + lane_id
        arrs = [r[0] for r in ins]
        arrs[0] = arrs[0] ^ SIGN       # unsigned order on the key word
        k = 2
        while k <= N:
            j = k >> 1
            while j >= 1:
                arrs = _compare_exchange(arrs, idx, k, j)
                j >>= 1
            k <<= 1
        arrs[0] = arrs[0] ^ SIGN
        for o, a in zip(outs, arrs):
            o[0] = a

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_sort(key: jnp.ndarray, pos: jnp.ndarray, *payload,
                 interpret: bool | None = None):
    """Sort (B, N) rows ascending by lexicographic (key, pos), carrying
    payload arrays. N must be a power of two >= 1024. All int32.

    Equivalent to jax.lax.sort((key, pos, *payload), num_keys=2) and
    differentially tested against it; pos doubling as the tiebreak makes
    the result order identical to a stable single-key sort.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = key.shape
    rows = N // LANES
    assert rows * LANES == N and (N & (N - 1)) == 0 and rows >= 8, N
    arrays = (key, pos) + payload
    n_arrays = len(arrays)

    grid = (B,)
    spec = pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(n_arrays, rows),
        grid=grid,
        in_specs=[spec] * n_arrays,
        out_specs=[spec] * n_arrays,
        out_shape=[jax.ShapeDtypeStruct((B, rows, LANES), jnp.int32)]
        * n_arrays,
        compiler_params=pltpu.CompilerParams(
            # The working set (arrs + partners + I/O buffers) exceeds the
            # default 16M scoped-vmem budget; v5e has headroom beyond it.
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*[a.astype(jnp.int32).reshape(B, rows, LANES) for a in arrays])
    return tuple(o.reshape(B, N) for o in out)
