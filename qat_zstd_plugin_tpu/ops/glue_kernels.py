"""Hand-fused Pallas glue kernels for the hash-matcher pipeline.

The candidates stage is elementwise-pass-bound: XLA materializes most of
the ~20 intermediate (B, 128K) arrays between the sorts, and (measured)
feeding a sort from a fused XLA elementwise producer also knocks the
sort off its fast path (~0.45 vs ~0.15 ms/Melem). Pallas producers do
not: key-build in a kernel + sort measured 0.19 ms/Melem total. So the
pipeline becomes kernel A -> sort -> kernel B -> sort -> kernel C with
exactly one HBM read and write per stage:

  A: block bytes -> packed (hash << pbits | pos) sort keys, per width
  B: sorted keys -> nearest-equal-hash offsets -> un-sort keys
  C: un-sorted offsets (all widths) + block bytes -> chain-doubled
     length estimates, cross-width merge, offset-1 run scan, cost
     filter -> (mlen, moff)

Semantics are identical to match_pipeline.candidates_hash (differential
test on small shapes); that XLA implementation remains the CPU-backend
path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _rows(n: int) -> int:
    """Block rows per grid step: Mosaic requires the row-block dimension
    to be divisible by 8 or equal to the full array dimension, so tile 8
    rows when possible and otherwise run the whole batch in one step."""
    return 8 if n % 8 == 0 else n


def _shl(a, s, fill, gp):
    """Element i <- a[i+s] along axis 1 (tail = fill). pltpu.roll keeps
    Mosaic happy where unaligned-width concatenates break it."""
    n = a.shape[1]
    r = pltpu.roll(a, n - s, axis=1)
    return jnp.where(gp < n - s, r, fill)


def _shr(a, s, fill, gp):
    """Element i <- a[i-s] along axis 1 (head = fill)."""
    r = pltpu.roll(a, s, axis=1)
    return jnp.where(gp >= s, r, fill)


def _winmin_tail(h8: jnp.ndarray, stride: int, gp: jnp.ndarray
                 ) -> jnp.ndarray:
    """Windowed-minimum doubling over an 8-byte-gram hash plane: entry i
    becomes min over [i, i+stride). Sign-flipped i32 min because Mosaic
    cannot legalize unsigned reductions. Shared by the three minimizer
    heads (ldm_winmin, hash_keys_winmin, hash_keys_winmin_sync) so the
    fill/sign logic cannot silently diverge between them."""
    m = (h8 ^ jnp.uint32(0x80000000)).astype(jnp.int32)
    s = 1
    while s < stride:
        m = jnp.minimum(m, _shl(m, s, jnp.int32(0x7FFFFFFF), gp))
        s *= 2
    return m.astype(jnp.uint32) ^ jnp.uint32(0x80000000)


def _hash_tile(x: jnp.ndarray, width: int, n: int, hbits: int,
               gp: jnp.ndarray) -> jnp.ndarray:
    """hbits-bit hash of the width-byte gram; x: (rows, n) uint32.
    Shifted byte reads come from in-kernel rolls (zero fill past the
    end), so the caller never pads — any host-level XLA op feeding these
    kernels measurably derails downstream sort/layout decisions."""
    C1 = jnp.uint32(2654435761)
    C2 = jnp.uint32(2246822519)
    C3 = jnp.uint32(3266489917)

    def at(shift: int) -> jnp.ndarray:
        if shift == 0:
            return x
        return _shl(x, shift, jnp.uint32(0), gp)

    def word(shift: int) -> jnp.ndarray:
        return ((at(shift) << 24) | (at(shift + 1) << 16)
                | (at(shift + 2) << 8) | at(shift + 3))

    w0 = word(0)
    if width == 4:
        h = w0 * C1
    elif width == 5:
        h = (w0 * C1) ^ ((at(4) * C2) << 11)
    elif width == 6:
        w1 = (at(4) << 8) | at(5)
        h = (w0 * C1) ^ (w1 * C2)
    elif width == 8:
        h = (w0 * C1) ^ (word(4) * C2) * C3
    else:
        raise ValueError(f"unsupported hash width {width}")
    return h >> (32 - hbits)


@functools.partial(jax.jit, static_argnames=("width", "window",
                                             "interpret"))
def hash_keys(blocks: jnp.ndarray, width: int, window: int,
              interpret: bool | None = None) -> jnp.ndarray:
    """(B, N) uint8 -> (B, N) uint32 packed (hash << pbits | segment pos)
    sort keys. Reads each block row once."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = blocks.shape
    w = min(window, N)
    pbits = (w - 1).bit_length()
    hbits = 32 - pbits
    rows = _rows(B)
    nseg = N // w

    # Output lands directly in the (B*nseg, w) shape the segment sorts
    # consume: a host-level reshape between a kernel and a sort knocks
    # XLA's sort off its fast path (~3x, measured), while the same
    # reshape inside the kernel's VMEM store is free. The tail-gram
    # zero fill happens in-kernel too (see _hash_tile) so the input is
    # the raw block array, untouched by any host op.
    def kernel(x_ref, out_ref):
        x = x_ref[...].astype(jnp.uint32)
        gp = jax.lax.broadcasted_iota(jnp.int32, (rows, N), 1)
        h = _hash_tile(x, width, N, hbits, gp)
        pos = jax.lax.broadcasted_iota(jnp.uint32, (rows, N), 1) \
            & jnp.uint32(w - 1)
        out_ref[...] = ((h << pbits) | pos).reshape(rows * nseg, w)

    return pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=[pl.BlockSpec((rows, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows * nseg, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nseg, w), jnp.uint32),
        compiler_params=_CP,
        interpret=interpret,
    )(blocks)


@functools.partial(jax.jit, static_argnames=("width", "window", "stride",
                                             "interpret"))
def hash_keys_winmin(blocks: jnp.ndarray, width: int, window: int,
                     stride: int, interpret: bool | None = None):
    """hash_keys + ldm_winmin in ONE kernel: both read the full block
    bytes, so fusing them saves one complete HBM read pass per batch
    (the 4-byte gram rolls are shared by both hashes). Returns
    ((B*nseg, w) sort keys, (B, N) windowed-minimizer plane)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = blocks.shape
    w = min(window, N)
    pbits = (w - 1).bit_length()
    hbits = 32 - pbits
    rows = _rows(B)
    nseg = N // w
    assert stride & (stride - 1) == 0

    def kernel(x_ref, key_ref, min_ref):
        x = x_ref[...].astype(jnp.uint32)
        gp = jax.lax.broadcasted_iota(jnp.int32, (rows, N), 1)
        h = _hash_tile(x, width, N, hbits, gp)
        pos = jax.lax.broadcasted_iota(jnp.uint32, (rows, N), 1) \
            & jnp.uint32(w - 1)
        key_ref[...] = ((h << pbits) | pos).reshape(rows * nseg, w)
        h8 = _hash_tile(x, 8, N, 32, gp)
        min_ref[...] = _winmin_tail(h8, stride, gp)

    return pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=[pl.BlockSpec((rows, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((rows * nseg, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((rows, N), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B * nseg, w), jnp.uint32),
                   jax.ShapeDtypeStruct((B, N), jnp.uint32)],
        compiler_params=_CP,
        interpret=interpret,
    )(blocks)


@functools.partial(jax.jit, static_argnames=("width", "window", "stride",
                                             "interpret"))
def hash_keys_winmin_sync(blocks: jnp.ndarray, width: int, window: int,
                          stride: int, interpret: bool | None = None):
    """hash_keys_winmin + pair-syncmer anchor selection in one kernel.

    Full-resolution anchoring sorts one key per byte; this selects one
    anchor per byte PAIR by ARGMIN PARITY: the member whose lane parity
    matches the parity of the windowed (SEL_W=4) h8 argmin — a
    content-determined winnowing rule, like the LDM sampler's minimizer
    at stride 32+. Selection depends on content AND the pair grid, so
    co-selection across two copies is probabilistic, not guaranteed:
    ~1/2 per content position at even offsets (aligned grids), ~0.40 at
    odd (the sliding argmin's relative parity nearly alternates; SEL_W=2
    degenerates to picking the smaller h8 of the pair, which co-selects
    only positions beating BOTH neighbors — the provable 1/3 ceiling for
    window-2 rules). Never zero, where fixed-grid stride-2 sampling is
    structurally blind to odd offsets entirely (measured 1.25x stock
    ratio, rejected). SEL_W choice is empirical: iid-hash co-selection
    keeps rising with the window (0.444 at 8, -> 1/2), but end-to-end
    ratio optimizes at 4 (measured L1 frames: SEL_W=2 1.0175x stock,
    4 = 1.0160x and consistently smaller on every probe corpus, 8 =
    1.0209x — longer windows desync selection near content boundaries
    faster than co-selection pays). tests/test_sync.py pins the
    properties. Both dominant sort volumes halve.

    Returns ((B*nseg, w/2) pair-selection keys — the even lanes of the
    kernel's full-width output, sliced inside this jit so the extraction
    shares the dispatch —, (B, N) windowed-minimizer plane for the LDM
    head). Even lane 2p holds (hash6(sel) << pbits | sel) with sel in
    {2p, 2p+1} chosen by the h8 compare; odd lanes are junk the slice
    drops (Mosaic cannot lane-decimate in-kernel, so the kernel writes
    full width)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = blocks.shape
    w = min(window, N)
    pbits = (w - 1).bit_length()
    hbits = 32 - pbits
    rows = _rows(B)
    nseg = N // w
    assert stride & (stride - 1) == 0  # stride 0: skip the LDM plane
    want_min = stride > 0

    def kernel(x_ref, key_ref, *min_refs):
        x = x_ref[...].astype(jnp.uint32)
        gp = jax.lax.broadcasted_iota(jnp.int32, (rows, N), 1)
        h = _hash_tile(x, width, N, hbits, gp)
        h8 = _hash_tile(x, 8, N, 32, gp)
        # Pair selection by ARGMIN PARITY (see the docstring for the
        # co-selection analysis and the empirical SEL_W=4 choice).
        # Parity rides the low bit of the minimized value (hash low bit
        # cleared); a log-depth doubling min extracts the window-argmin
        # parity without materializing the argmin itself. Sign-flipped
        # i32 min like _winmin_tail (Mosaic cannot legalize unsigned
        # vector min on this target).
        par = (gp & 1).astype(jnp.int32)
        v = ((h8 & jnp.uint32(0xFFFFFFFE)) ^ jnp.uint32(0x80000000)) \
            .astype(jnp.int32) | par
        for s in (1, 2):  # SEL_W = 4
            v = jnp.minimum(v, _shl(v, s, jnp.int32(0x7FFFFFFF), gp))
        hn = _shl(h, 1, jnp.uint32(0), gp)
        pick_next = (v & 1) == 1
        pos = jax.lax.broadcasted_iota(jnp.uint32, (rows, N), 1) \
            & jnp.uint32(w - 1)
        selh = jnp.where(pick_next, hn, h)
        selp = jnp.where(pick_next, pos + 1, pos)
        key_ref[...] = ((selh << pbits) | selp).reshape(rows * nseg, w)
        if want_min:  # LDM minimizer plane (shares the h8 gram read)
            min_refs[0][...] = _winmin_tail(h8, stride, gp)

    out_specs = [pl.BlockSpec((rows * nseg, w), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B * nseg, w), jnp.uint32)]
    if want_min:
        out_specs.append(pl.BlockSpec((rows, N), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, N), jnp.uint32))
    out = pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=[pl.BlockSpec((rows, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_CP,
        interpret=interpret,
    )(blocks)
    return out[0][:, ::2], (out[1] if want_min else None)


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def gram_pos_planes(blocks: jnp.ndarray, window: int,
                    interpret: bool | None = None):
    """(B, N) uint8 -> ((B*nseg, w) 4-byte grams, (B*nseg, w) positions).

    The verified-matcher head (device-entropy hash path): sorting by the
    RAW GRAM (lexicographic (gram, pos), no hash) groups equal grams
    exactly, so the neighbor pass's equality is TRUE byte equality —
    every emitted candidate is a real >= 4-byte match, like the content
    matcher but with one carried word instead of four."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = blocks.shape
    w = min(window, N)
    rows = _rows(B)
    nseg = N // w

    def kernel(x_ref, g_ref, p_ref):
        x = x_ref[...].astype(jnp.uint32)
        gp = jax.lax.broadcasted_iota(jnp.int32, (rows, N), 1)
        x1 = _shl(x, 1, jnp.uint32(0), gp)
        x2 = _shl(x, 2, jnp.uint32(0), gp)
        x3 = _shl(x, 3, jnp.uint32(0), gp)
        g_ref[...] = ((x << 24) | (x1 << 16) | (x2 << 8) | x3) \
            .reshape(rows * nseg, w)
        pos = jax.lax.broadcasted_iota(jnp.uint32, (rows, N), 1) \
            & jnp.uint32(w - 1)
        p_ref[...] = pos.reshape(rows * nseg, w)

    seg = pl.BlockSpec((rows * nseg, w), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=[pl.BlockSpec((rows, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[seg, seg],
        out_shape=[jax.ShapeDtypeStruct((B * nseg, w), jnp.uint32)] * 2,
        compiler_params=_CP,
        interpret=interpret,
    )(blocks)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _sort_rows2(g, pos):
    """Lexicographic (gram, pos) row sort as its own dispatch.
    Multi-key sorts never get XLA's single-operand fast path, but the
    verified matcher needs exact gram grouping exactly once."""
    return jax.lax.sort((g, pos), dimension=1, is_stable=False,
                        num_keys=2)


@functools.partial(jax.jit, static_argnames=("pbits", "neighbors",
                                             "interpret"))
def neighbor_verify_keys(sg: jnp.ndarray, sp: jnp.ndarray, pbits: int,
                         neighbors: int = 1,
                         interpret: bool | None = None) -> jnp.ndarray:
    """Sorted (grams, positions) -> un-sort keys (pos << hbits | offset)
    where the claimed offset is BYTE-VERIFIED: the k-th previous entry
    must carry an EQUAL 4-byte gram (sorted by gram, so equal grams are
    adjacent and position-ordered). Downstream chain-doubling over these
    claims composes true equalities, so every emitted length is exact in
    4-byte units — the property the on-device entropy encoder needs (no
    host verification pass exists in that mode)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R, w = sg.shape
    hbits = 32 - pbits
    rows = _rows(R)

    def kernel(sg_ref, sp_ref, out_ref):
        g = sg_ref[...]
        sp_ = sp_ref[...]
        gp = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)
        off = jnp.zeros_like(sp_)
        for k in range(1, neighbors + 1):
            pg = _shr(g, k, jnp.uint32(0xFFFFFFFF), gp)
            pp = _shr(sp_, k, jnp.uint32(0), gp)
            # Tail-gram guard: equal grams that are both zero-extended
            # past the block end would "verify" padding; finalize's
            # gp + 4 <= blen mask drops those probes.
            eq = (g == pg) & (pp < sp_)
            off = jnp.where((off == 0) & eq, sp_ - pp, off)
        out_ref[...] = (sp_ << hbits) | off

    spec = pl.BlockSpec((rows, w), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(R // rows,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((R, w), jnp.uint32),
        compiler_params=_CP,
        interpret=interpret,
    )(sg, sp)


@functools.partial(jax.jit, static_argnames=("window", "chain_steps",
                                             "far_min", "near_off",
                                             "interpret"))
def finalize_verified(su: jnp.ndarray, blocks: jnp.ndarray,
                      lengths: jnp.ndarray, window: int,
                      chain_steps: int = 3, far_min: int = 4,
                      near_off: int = 32768,
                      interpret: bool | None = None):
    """Position-ordered verified claims -> exact (mlen, moff).

    Claims arrive byte-verified for 4 bytes (neighbor_verify_keys);
    chain-doubling over SAME-OFFSET claims at +4-byte steps composes
    them into exact lengths in 4-byte units (claim at t and t+4 with
    offset o means bytes [t, t+8) truly equal). Offset-1 runs keep
    exact arbitrary lengths from the byte-compare scan. Unlike
    finalize_candidates' estimates, every output here is a true match —
    safe to encode on device with no host pass."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = blocks.shape
    w = min(window, N)
    pbits = (w - 1).bit_length()
    omask = (1 << pbits) - 1
    rows = _rows(B)
    nseg = N // w

    def kernel(su_ref, x_ref, len_ref, mlen_ref, moff_ref):
        blen = len_ref[...][:, :1]
        gp = jax.lax.broadcasted_iota(jnp.int32, (rows, N), 1)
        offs = (su_ref[...] & omask).astype(jnp.int32).reshape(rows, N)
        offs = jnp.where(gp + 4 <= blen, offs, 0)
        reach = (offs > 0).astype(jnp.int32)
        span_units = 1
        for _ in range(chain_steps):
            shift = span_units * 4
            nxt_off = _shl(offs, shift, 0, gp)
            nxt_reach = _shl(reach, shift, 0, gp)
            cont = (offs > 0) & (reach == span_units) & (nxt_off == offs)
            reach = jnp.where(cont, reach + nxt_reach, reach)
            span_units *= 2
        mlen = reach * 4
        moff = offs
        # Default = take every verified match (far_min=4, near_off=w):
        # swept on the mixed corpus — filters LOSE ratio here because
        # every claim is already a true match and the FSE tables absorb
        # short-match codes well (0.2886 unfiltered vs 0.3012 filtered).
        worth = ((mlen >= far_min)
                 | ((mlen >= 4) & (moff <= near_off)))
        mlen = jnp.where(worth, mlen, 0)
        moff = jnp.where(worth, moff, 0)
        mlen = jnp.minimum(mlen, 16383)

        # Offset-1 runs: exact lengths from the byte-compare scan
        # (true bytes, same as finalize_candidates' final pass).
        x = x_ref[...].astype(jnp.int32)
        big = jnp.int32(2 ** 30)
        xn = _shl(x, 1, -1, gp)
        chg = x != xn
        r = jnp.where(chg, gp, big)
        step = 1
        nsteps = min(14, max(1, (N - 1).bit_length()))
        for _ in range(nsteps):
            r = jnp.minimum(r, _shl(r, step, big, gp))
            step *= 2
        len1 = r - gp + 1
        len1 = jnp.minimum(jnp.minimum(len1, blen - gp), 16383)
        xp0 = _shr(x, 1, -1, gp)
        prev_eq = x == xp0
        use1 = prev_eq & (len1 >= 4) & (len1 > mlen)
        mlen_ref[...] = jnp.where(use1, len1, mlen)
        moff_ref[...] = jnp.where(use1, 1, moff)

    spec = pl.BlockSpec((rows, N), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    seg_spec = pl.BlockSpec((rows * nseg, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((rows, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=[seg_spec, spec, len_spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((B, N), jnp.int32)] * 2,
        compiler_params=_CP,
        interpret=interpret,
    )(su, blocks, lengths.reshape(B, 1).astype(jnp.int32))


def candidates_hash_verified(blocks: jnp.ndarray, lengths: jnp.ndarray,
                             neighbors: int = 2, window: int = 32768,
                             chain_steps: int = 3, far_min: int = 4,
                             near_off: int = 32768,
                             interpret: bool | None = None):
    """Byte-verified hash-path candidates: every (mlen, moff) is a true
    match (split-dispatch: 2-op sort -> verify kernel -> fast un-sort
    -> exact finalize). The device-entropy matcher for fast levels."""
    B, N = blocks.shape
    w = min(window, N)
    pbits = (w - 1).bit_length()
    g0, pos = gram_pos_planes(blocks, window, interpret=interpret)
    sg, sp = _sort_rows2(g0, pos)
    su = _sort_rows(neighbor_verify_keys(sg, sp, pbits, neighbors,
                                         interpret=interpret))
    return finalize_verified(su, blocks, lengths, window,
                             chain_steps=chain_steps, far_min=far_min,
                             near_off=near_off, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("pbits", "neighbors",
                                             "pos_mask", "interpret"))
def neighbor_unsort_keys(sk: jnp.ndarray, pbits: int, neighbors: int = 1,
                         pos_mask: int | None = None,
                         interpret: bool | None = None) -> jnp.ndarray:
    """Sorted keys (R, w) -> un-sort keys (pos << hbits | offset): the
    nearest previous equal-hash entry claims offset pos - prev.

    pos_mask overrides the position-field mask when the row holds fewer
    entries than position values (the syncmer rows carry one entry per
    byte PAIR, so w/2 entries span w positions)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R, w = sk.shape
    hbits = 32 - pbits
    pmask = pos_mask if pos_mask is not None else w - 1  # immediate
    rows = _rows(R)

    def kernel(sk_ref, out_ref):
        s = sk_ref[...]
        gp = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)
        sh = s >> pbits
        sp = s & pmask
        off = jnp.zeros_like(s)
        for k in range(1, neighbors + 1):
            ph = _shr(sh, k, jnp.uint32(0xFFFFFFFF), gp)
            pp = _shr(sp, k, jnp.uint32(0), gp)
            eq = (sh == ph) & (pp < sp)
            off = jnp.where((off == 0) & eq, sp - pp, off)
        out_ref[...] = (s << hbits) | off

    return pl.pallas_call(
        kernel,
        grid=(R // rows,),
        in_specs=[pl.BlockSpec((rows, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, w), jnp.uint32),
        compiler_params=_CP,
        interpret=interpret,
    )(sk)


def finalize_candidates(sus: tuple, blocks: jnp.ndarray,
                        lengths: jnp.ndarray, widths: tuple, window: int,
                        chain_steps: int = 2,
                        interpret: bool | None = None):
    """Per-width un-sorted key arrays + block bytes -> (mlen, moff).

    Chain-doubled true-length estimation, cross-width merge (longer est
    first, then nearer), offset-1 run scan (exact, 14-step doubling),
    and the cost filter — candidates_hash semantics in VMEM passes.
    Processes at most 2 widths per Pallas kernel (4 widths measured an
    ~80 MB register spill past the 128 MB v5e VMEM) and carries the
    running (mlen, moff) merge between passes; filter + run scan happen
    on the final pass only, so chunking is semantics-free.
    """
    carry = None
    for i in range(0, len(widths), 2):
        last = i + 2 >= len(widths)
        carry = _finalize_chunk(tuple(sus[i:i + 2]), blocks, lengths,
                                tuple(widths[i:i + 2]), window,
                                chain_steps, carry, last,
                                interpret=interpret)
    return carry


@functools.partial(jax.jit, static_argnames=("widths", "window",
                                             "chain_steps", "final",
                                             "interpret"))
def _finalize_chunk(sus: tuple, blocks: jnp.ndarray,
                    lengths: jnp.ndarray, widths: tuple, window: int,
                    chain_steps: int, carry, final: bool,
                    interpret: bool | None = None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = blocks.shape
    w = min(window, N)
    pbits = (w - 1).bit_length()
    omask = (1 << pbits) - 1  # python int: folded as an immediate
    rows = _rows(B)

    nseg = N // w

    ncarry = 2 if carry is not None else 0

    def kernel(*refs):
        su_refs = refs[:len(widths)]
        x_ref = refs[len(widths)]
        len_ref = refs[len(widths) + 1]
        carry_refs = refs[len(widths) + 2:len(widths) + 2 + ncarry]
        mlen_ref, moff_ref = refs[len(widths) + 2 + ncarry:]
        blen = len_ref[...][:, :1]  # (rows, 1)

        if ncarry:
            mlen = carry_refs[0][...]
            moff = carry_refs[1][...]
        else:
            mlen = jnp.zeros((rows, N), jnp.int32)
            moff = jnp.zeros((rows, N), jnp.int32)
        gp = jax.lax.broadcasted_iota(jnp.int32, (rows, N), 1)
        for su_ref, width in zip(su_refs, widths):
            offs = (su_ref[...] & omask).astype(jnp.int32) \
                .reshape(rows, N)
            offs = jnp.where(gp + width <= blen, offs, 0)
            reach = (offs > 0).astype(jnp.int32)
            span_units = 1
            for _ in range(chain_steps):
                shift = span_units * width
                nxt_off = _shl(offs, shift, 0, gp)
                nxt_reach = _shl(reach, shift, 0, gp)
                cont = (offs > 0) & (reach == span_units) \
                    & (nxt_off == offs)
                reach = jnp.where(cont, reach + nxt_reach, reach)
                span_units *= 2
            est = reach * width
            better = (est > mlen) | ((est == mlen) & (offs > 0)
                                     & ((offs < moff) | (moff == 0)))
            take = (offs > 0) & better
            mlen = jnp.where(take, est, mlen)
            moff = jnp.where(take, offs, moff)

        if not final:
            mlen_ref[...] = mlen
            moff_ref[...] = moff
            return

        worth = ((mlen >= 7)
                 | ((mlen >= 6) & (moff <= 32768))
                 | ((mlen >= 5) & (moff <= 4096))
                 | ((mlen >= 4) & (moff <= 256)))
        mlen = jnp.where(worth, mlen, 0)
        moff = jnp.where(worth, moff, 0)
        mlen = jnp.minimum(mlen, 16383)

        # Offset-1 runs: run_end = suffix-min of change indices, by
        # doubling (cap 16383 keeps 14 steps enough).
        x = x_ref[...].astype(jnp.int32)
        big = jnp.int32(2 ** 30)
        xn = _shl(x, 1, -1, gp)         # next byte (-1 sentinel: change)
        chg = x != xn
        r = jnp.where(chg, gp, big)
        step = 1
        # Doubling to cover runs up to min(16383, N) — fixed 14 steps
        # would roll by more than the lane count on small blocks.
        nsteps = min(14, max(1, (N - 1).bit_length()))
        for _ in range(nsteps):
            r = jnp.minimum(r, _shl(r, step, big, gp))
            step *= 2
        len1 = r - gp + 1
        len1 = jnp.minimum(jnp.minimum(len1, blen - gp), 16383)
        xp0 = _shr(x, 1, -1, gp)        # previous byte (-1: no match)
        prev_eq = x == xp0
        use1 = prev_eq & (len1 >= 4) & (len1 > mlen)
        mlen_ref[...] = jnp.where(use1, len1, mlen)
        moff_ref[...] = jnp.where(use1, 1, moff)

    spec = pl.BlockSpec((rows, N), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    seg_spec = pl.BlockSpec((rows * nseg, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((rows, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    carry_ops = list(carry) if carry is not None else []
    return pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=[seg_spec] * len(widths) + [spec, len_spec]
        + [spec] * ncarry,
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((B, N), jnp.int32)] * 2,
        compiler_params=_CP,
        interpret=interpret,
    )(*sus, blocks, lengths.reshape(B, 1).astype(jnp.int32),
      *carry_ops)


@functools.partial(jax.jit, static_argnames=("window", "max_seq",
                                             "interpret"))
def compact_operands(chosen: jnp.ndarray, mlen: jnp.ndarray,
                     moff: jnp.ndarray, window: int, max_seq: int = 0,
                     interpret: bool | None = None):
    """(B, N) parse outputs -> two (B*nseg, w) u32 sort operands for the
    parallel-payload compaction (match_pipeline.compact_fast semantics):
    key = poskey << 16 | payload, poskey = local pos for chosen slots and
    w + local pos otherwise — DISTINCT sentinels keep the sort's key
    distribution healthy, and sorted order still puts every chosen slot
    first. Emitted directly in segment shape (no host reshapes)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = chosen.shape
    w = min(window, N)
    nseg = N // w
    rows = _rows(B)
    assert w <= 32768  # poskey needs 16 bits incl. sentinel range

    def kernel(ch_ref, ml_ref, of_ref, a_ref, b_ref):
        gp = jax.lax.broadcasted_iota(jnp.uint32, (rows, N), 1) \
            & jnp.uint32(w - 1)
        ch = ch_ref[...] != 0
        poskey = jnp.where(ch, gp, gp + jnp.uint32(w)) << 16
        a = poskey | ml_ref[...].astype(jnp.uint32)
        b = poskey | of_ref[...].astype(jnp.uint32)
        a_ref[...] = a.reshape(rows * nseg, w)
        b_ref[...] = b.reshape(rows * nseg, w)

    spec = pl.BlockSpec((rows, N), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    seg_spec = pl.BlockSpec((rows * nseg, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=[spec] * 3,
        out_specs=[seg_spec, seg_spec],
        out_shape=[jax.ShapeDtypeStruct((B * nseg, w), jnp.uint32)] * 2,
        compiler_params=_CP,
        interpret=interpret,
    )(chosen.astype(jnp.int32), mlen, moff)


def compact_fast_glue(chosen, mlen, moff, lengths, max_seq: int,
                      window: int, interpret: bool | None = None):
    """compact_fast with the operand build in a Pallas kernel and the
    sorts fed segment-shaped operands (identical outputs; differential
    test vs compact_fast)."""
    from .match_pipeline import MIN_MATCH

    B, N = chosen.shape
    req_seq = max_seq
    max_seq = min(max_seq, N)
    w = min(window, N)
    nseg = N // w
    opA, opB = compact_operands(chosen, mlen, moff, window,
                                interpret=interpret)
    sA = jax.lax.sort((opA,), dimension=1, is_stable=False, num_keys=1)[0]
    sB = jax.lax.sort((opB,), dimension=1, is_stable=False, num_keys=1)[0]
    capseg = min(w // MIN_MATCH, max_seq)
    segpos = (sA[:, :capseg] >> 16).astype(jnp.int32)
    segml = (sA[:, :capseg] & jnp.uint32(0xFFFF)).astype(jnp.int32)
    segoff = (sB[:, :capseg] & jnp.uint32(0xFFFF)).astype(jnp.int32)
    nseq = chosen.sum(axis=1).astype(jnp.int32)
    if nseg > 1:
        R = B * nseg
        seg_start = ((jnp.arange(R, dtype=jnp.int32) % nseg) * w)[:, None]
        seg_cnt = chosen.reshape(R, w).sum(axis=1).astype(jnp.int32)[:, None]
        valid = jnp.arange(capseg, dtype=jnp.int32)[None, :] < seg_cnt
        gpos = jnp.where(valid, segpos + seg_start, N - 1) \
            .astype(jnp.uint32)
        gbits = (N - 1).bit_length()
        gshift = 32 - gbits
        M = nseg * capseg
        gpos = gpos.reshape(B, M)
        gml = jnp.where(valid, segml, 0).reshape(B, M).astype(jnp.uint32)
        goff = jnp.where(valid, segoff, 0).reshape(B, M) \
            .astype(jnp.uint32)
        gA = jax.lax.sort(((gpos << gshift) | gml,), dimension=1,
                          is_stable=False, num_keys=1)[0]
        gB = jax.lax.sort(((gpos << gshift) | goff,), dimension=1,
                          is_stable=False, num_keys=1)[0]
        take = min(max_seq, M)
        t2 = (gA[:, :take] >> gshift).astype(jnp.int32)
        l2 = (gA[:, :take] & jnp.uint32((1 << gshift) - 1)) \
            .astype(jnp.int32)
        o2 = (gB[:, :take] & jnp.uint32((1 << gshift) - 1)) \
            .astype(jnp.int32)
    else:
        take = min(max_seq, capseg)
        t2 = segpos[:, :take]
        l2 = segml[:, :take]
        o2 = segoff[:, :take]
    if take < max_seq:
        t2 = jnp.pad(t2, ((0, 0), (0, max_seq - take)))
        l2 = jnp.pad(l2, ((0, 0), (0, max_seq - take)))
        o2 = jnp.pad(o2, ((0, 0), (0, max_seq - take)))
    srow = jnp.broadcast_to(jnp.arange(max_seq, dtype=jnp.int32)[None, :],
                            (B, max_seq))
    valid = srow < nseq[:, None]
    prev_end = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), (t2 + l2)[:, :-1]], axis=1)
    lit = jnp.where(valid, t2 - prev_end, 0)
    ml = jnp.where(valid, l2, 0)
    off = jnp.where(valid, o2, 0)
    ends = jnp.where(valid, t2 + l2, 0)
    last_end = ends.max(axis=1)
    last_literals = lengths.astype(jnp.int32) - last_end
    overflow = nseq > max_seq
    if req_seq > max_seq:
        pad = req_seq - max_seq
        lit = jnp.pad(lit, ((0, 0), (0, pad)))
        off = jnp.pad(off, ((0, 0), (0, pad)))
        ml = jnp.pad(ml, ((0, 0), (0, pad)))
    return {
        "lit_len": lit, "offset": off, "match_len": ml,
        "nseq": jnp.minimum(nseq, max_seq), "last_literals": last_literals,
        "overflow": overflow,
    }


@functools.partial(jax.jit, donate_argnums=0)
def _sort_rows(x):
    """Single-word row sort as its OWN dispatch: a sort compiled together
    with producer/consumer ops in one program loses its fast code path
    (~0.45 vs ~0.15 ms/Melem, measured repeatedly); as a standalone jit
    it keeps it, and JAX's async dispatch pipelines the extra program
    boundaries so steady-state throughput only improves. The operand is
    donated — every caller feeds a dead intermediate, and reusing its
    buffer keeps more in-flight batches inside HBM (the pipelining
    capacity that hides per-dispatch latency)."""
    return jax.lax.sort((x,), dimension=1, is_stable=False, num_keys=1)[0]


def candidates_hash_glue(blocks: jnp.ndarray, lengths: jnp.ndarray,
                         widths: tuple = (5, 8), neighbors: int = 1,
                         window: int = 32768, chain_steps: int = 2,
                         interpret: bool | None = None):
    """Glue-kernel implementation of candidates_hash: A -> sort -> B ->
    sort -> C with VMEM-resident stages between XLA's fast single-word
    sorts. All sort operands live in segment shape (B*nseg, w) end to
    end — no host reshapes touch them."""
    B, N = blocks.shape
    w = min(window, N)
    pbits = (w - 1).bit_length()
    sus = []
    for width in widths:
        key = hash_keys(blocks, width, window, interpret=interpret)
        sk = jax.lax.sort((key,), dimension=1, is_stable=False,
                          num_keys=1)[0]
        un = neighbor_unsort_keys(sk, pbits, neighbors,
                                  interpret=interpret)
        su = jax.lax.sort((un,), dimension=1, is_stable=False,
                          num_keys=1)[0]
        sus.append(su)
    return finalize_candidates(tuple(sus), blocks, lengths, tuple(widths),
                               window, chain_steps, interpret=interpret)


def candidates_hash_split(blocks: jnp.ndarray, lengths: jnp.ndarray,
                          widths: tuple = (5, 8), neighbors: int = 1,
                          window: int = 32768, chain_steps: int = 2,
                          interpret: bool | None = None):
    """Split-dispatch variant: every sort runs as its own jit (see
    _sort_rows). Same results as candidates_hash_glue/candidates_hash."""
    B, N = blocks.shape
    w = min(window, N)
    pbits = (w - 1).bit_length()
    sus = []
    for width in widths:
        key = hash_keys(blocks, width, window, interpret=interpret)
        su = _sort_rows(neighbor_unsort_keys(_sort_rows(key), pbits,
                                             neighbors,
                                             interpret=interpret))
        sus.append(su)
    return finalize_candidates(tuple(sus), blocks, lengths, tuple(widths),
                               window, chain_steps, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("max_seq", "window"))
def _merge_operands(sA, sB, chosen, max_seq: int, window: int):
    """Segment-prefix extraction -> global-merge sort operands."""
    from .match_pipeline import MIN_MATCH

    R, w = sA.shape
    nseg = w and (chosen.shape[1] // w)
    B = chosen.shape[0]
    N = chosen.shape[1]
    capseg = min(w // MIN_MATCH, min(max_seq, N))
    segpos = (sA[:, :capseg] >> 16).astype(jnp.int32)
    segml = (sA[:, :capseg] & jnp.uint32(0xFFFF)).astype(jnp.int32)
    segoff = (sB[:, :capseg] & jnp.uint32(0xFFFF)).astype(jnp.int32)
    seg_start = ((jnp.arange(R, dtype=jnp.int32) % nseg) * w)[:, None]
    seg_cnt = chosen.reshape(R, w).sum(axis=1).astype(jnp.int32)[:, None]
    valid = jnp.arange(capseg, dtype=jnp.int32)[None, :] < seg_cnt
    gpos = jnp.where(valid, segpos + seg_start, N - 1).astype(jnp.uint32)
    gshift = 32 - (N - 1).bit_length()
    M = nseg * capseg
    gpos = gpos.reshape(B, M)
    gml = jnp.where(valid, segml, 0).reshape(B, M).astype(jnp.uint32)
    goff = jnp.where(valid, segoff, 0).reshape(B, M).astype(jnp.uint32)
    return (gpos << gshift) | gml, (gpos << gshift) | goff


@functools.partial(jax.jit, static_argnames=("max_seq", "window"))
def _compact_tail(gA, gB, chosen, lengths, max_seq: int, window: int):
    """Post-merge compaction tail: per-sequence field computation + pack
    (compact_fast semantics). gA/gB are the sorted global-merge words
    (nseg > 1) or the sorted per-segment operands (nseg == 1)."""
    from .match_pipeline import MIN_MATCH

    B = chosen.shape[0]
    N = chosen.shape[1]
    req_seq = max_seq
    max_seq = min(max_seq, N)
    w = min(window, N)
    nseg = N // w
    nseq = chosen.sum(axis=1).astype(jnp.int32)
    if nseg > 1:
        gshift = 32 - (N - 1).bit_length()
        M = gA.shape[1]
        take = min(max_seq, M)
        t2 = (gA[:, :take] >> gshift).astype(jnp.int32)
        l2 = (gA[:, :take] & jnp.uint32((1 << gshift) - 1)) \
            .astype(jnp.int32)
        o2 = (gB[:, :take] & jnp.uint32((1 << gshift) - 1)) \
            .astype(jnp.int32)
    else:
        capseg = min(w // MIN_MATCH, max_seq)
        take = min(max_seq, capseg)
        t2 = (gA[:, :take] >> 16).astype(jnp.int32)
        l2 = (gA[:, :take] & jnp.uint32(0xFFFF)).astype(jnp.int32)
        o2 = (gB[:, :take] & jnp.uint32(0xFFFF)).astype(jnp.int32)
    if take < max_seq:
        t2 = jnp.pad(t2, ((0, 0), (0, max_seq - take)))
        l2 = jnp.pad(l2, ((0, 0), (0, max_seq - take)))
        o2 = jnp.pad(o2, ((0, 0), (0, max_seq - take)))
    srow = jnp.broadcast_to(jnp.arange(max_seq, dtype=jnp.int32)[None, :],
                            (B, max_seq))
    valid = srow < nseq[:, None]
    prev_end = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), (t2 + l2)[:, :-1]], axis=1)
    lit = jnp.where(valid, t2 - prev_end, 0)
    ml = jnp.where(valid, l2, 0)
    off = jnp.where(valid, o2, 0)
    ends = jnp.where(valid, t2 + l2, 0)
    last_end = ends.max(axis=1)
    last_literals = lengths.astype(jnp.int32) - last_end
    overflow = nseq > max_seq
    if req_seq > max_seq:
        pad = req_seq - max_seq
        lit = jnp.pad(lit, ((0, 0), (0, pad)))
        off = jnp.pad(off, ((0, 0), (0, pad)))
        ml = jnp.pad(ml, ((0, 0), (0, pad)))
    out = {
        "lit_len": lit, "offset": off, "match_len": ml,
        "nseq": jnp.minimum(nseq, max_seq), "last_literals": last_literals,
        "overflow": overflow,
    }
    from .match_pipeline import pack_outputs
    return pack_outputs(out, req_seq)


def find_matches_hash_split(blocks, lengths, widths=(5, 8),
                            neighbors: int = 1, window: int = 32768,
                            max_seq: int = 16384, parser: str = "pallas",
                            lazy: bool = False,
                            interpret: bool | None = None):
    """Full hash-matcher pipeline as a split-dispatch chain, returning the
    packed (B, max_seq+1, 2) result array (find_matches_packed contract).
    JAX async dispatch keeps all stages of consecutive batches in flight,
    so per-dispatch latency amortizes away in steady state — this is the
    production TPU path for the fast levels."""
    from .match_pipeline import _parse

    B, N = blocks.shape
    mlen, moff = candidates_hash_split(blocks, lengths, widths=widths,
                                       neighbors=neighbors, window=window,
                                       interpret=interpret)
    chosen = _parse(mlen, parser, lazy)
    chosen = chosen.astype(jnp.int32)
    opA, opB = compact_operands(chosen, mlen, moff, window,
                                interpret=interpret)
    sA = _sort_rows(opA)
    sB = _sort_rows(opB)
    if N // min(window, N) > 1:
        return _merge_tail_fused(sA, sB, chosen, lengths, max_seq, window)
    return _compact_tail(sA, sB, chosen, lengths, max_seq, window)


@functools.partial(jax.jit, static_argnames=("max_seq", "window"),
                   donate_argnums=(0, 1))
def _merge_tail_fused(sA, sB, chosen, lengths, max_seq: int, window: int):
    """Merge + tail as ONE program: the merge sorts are small (N/4) and
    extra dispatches measured net-slower than their in-jit slowdown at
    production batch sizes."""
    gA, gB = _merge_operands(sA, sB, chosen, max_seq, window)
    gA = jax.lax.sort((gA,), dimension=1, is_stable=False, num_keys=1)[0]
    gB = jax.lax.sort((gB,), dimension=1, is_stable=False, num_keys=1)[0]
    return _compact_tail(gA, gB, chosen, lengths, max_seq, window)


# ---------------------------------------------------------------------------
# Positions contract (the hash fast path's lean device->host protocol).
#
# The host extension pass (native qz_extend_sequences) recomputes every
# match's TRUE length by byte comparison regardless of the claimed length,
# so carrying lengths off the device is pure waste for the hash matcher:
# the device sends only (position, offset) per chosen claim and the host
# reconstructs (lit_len, offset, MIN_MATCH) claims, which extension turns
# into exact sequences. This removes one of the two full-size compaction
# sorts and halves the merge sorts.
#
# Second win: the greedy parse spaces chosen positions >= MIN_MATCH (=4)
# apart, so each aligned 4-byte slot holds at most one claim — the
# compaction sort runs on an N/4 slot grid (4x fewer elements) built by an
# in-kernel windowed min.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def compact_slots(chosen: jnp.ndarray, moff: jnp.ndarray, window: int,
                  interpret: bool | None = None):
    """(B, N) parse outputs -> (B*nseg, w/4) u32 slot words.

    Slot word: real claim -> (k << 30) | byte_offset   (pos = 4*slot + k)
               empty slot -> 0xFFFFFFFF
    The slot index IS the position (the parse spaces claims >= MIN_MATCH
    = 4 apart, so each aligned 4-byte slot holds at most one claim); only
    the 2-bit subslot k and the offset ride in the word, leaving 30 bits
    of RAW byte offset — enough for segment windows up to 64K+ and
    unquantized long-distance offsets (merge_ldm) alike. No device-side
    sort: the host mask-selects non-sentinel words row-major
    (unpack_segments).

    The 4:1 slot reduction takes four host-side strided views of each
    input (Mosaic cannot split the lane dim in-kernel); XLA slices feeding
    a Pallas kernel are safe — they are not fused into sort programs.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = chosen.shape
    w = min(window, N)
    nseg = N // w
    rows = _rows(B)
    Ns = N // 4  # slots per block
    ws = w // 4  # slots per segment

    def kernel(*refs):
        ch = [refs[k][...] for k in range(4)]
        of = [refs[4 + k][...] for k in range(4)]
        # Sign-flipped i32 min (Mosaic lacks unsigned reductions):
        # sentinel 0xFFFFFFFF flips to INT32_MAX, claims keep subslot
        # priority order (only one claim per slot exists anyway).
        empty = jnp.int32(0x7FFFFFFF)
        best = empty
        for k in range(4):
            chk = ch[k] != 0
            keyk = ((jnp.int32(k) << 30) | of[k]) \
                ^ jnp.int32(-0x80000000)
            best = jnp.minimum(best, jnp.where(chk, keyk, empty))
        best = (best ^ jnp.int32(-0x80000000)).astype(jnp.uint32)
        refs[8][...] = best.reshape(rows * nseg, ws)

    spec = pl.BlockSpec((rows, Ns), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    ch4 = [chosen[:, k::4] for k in range(4)]
    of4 = [moff[:, k::4] for k in range(4)]
    return pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=[spec] * 8,
        out_specs=pl.BlockSpec((rows * nseg, ws), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nseg, ws), jnp.uint32),
        compiler_params=_CP,
        interpret=interpret,
    )(*[c.astype(jnp.int32) for c in ch4], *of4)


# ---------------------------------------------------------------------------
# Long-distance matching (LDM): the device window above is segment-local
# (32K), so the hash matcher is structurally blind to redundancy at longer
# range — cross-segment inside a block and cross-block inside a batch.
# Stock zstd sees both through its streaming window; this is the device
# answer (the role zstd's own --long/LDM mode plays, generalized to the
# batch buffer).
#
# Design: blocks are CONSECUTIVE stream bytes within a batch (tpu_codec
# feeds sorted full-block runs). Rows of `sb` adjacent blocks (sb=4 -> a
# 512 KiB "span") are each paired with the PREVIOUS span as sliding
# context, so every position effectively sees up to 512 KiB back — the
# same back-reach stock zstd's L1 window (window_log 19) gives its
# streaming matcher. Sample 8-byte grams every 32 bytes over [prev span |
# span] and reuse the exact single-word-sort machinery of the short-range
# path on the combined rows: key = (hash17 << 15 | sample_idx), sort,
# nearest-previous-equal-hash, un-sort. A candidate is accepted only when
# >= 2 CONSECUTIVE samples agree on the same sample offset (a 64-byte
# chained check that makes hash-collision false positives ~2^-34), then
# competes in the parse against the local candidates with its chained
# length estimate. Offsets ride the slot contract's free bit 15 as
# (0x8000 | byte_off >> 4) — sampled positions are 32-aligned so the
# quantized offset is EXACT, up to 512 KiB (always inside the frame
# window: window_log >= 19 at every level). The host extension pass
# byte-verifies and extends each claim against the cross-block window
# context it already receives, so LDM adds zero new trust surface; a
# first-span claim that reaches bytes the device never saw (the zero
# context pad) simply fails verification and degrades to literals.
# ---------------------------------------------------------------------------

def ldm_stride(span_blocks: int, n: int) -> int:
    """Sample spacing that keeps the combined row at <= 65536 samples so
    the packed keys keep >= 16 hash bits (the two-consecutive-sample
    chain requirement keeps false candidates rare even at 16 bits)."""
    s = 32
    while 2 * span_blocks * (n // s) > 65536:
        s *= 2
    return s


@functools.partial(jax.jit, static_argnames=("stride", "interpret"))
def ldm_winmin(blocks: jnp.ndarray, stride: int,
               interpret: bool | None = None) -> jnp.ndarray:
    """(B, N) uint8 -> (B, N) uint32: windowed MINIMIZER hash — entry i
    holds min over [i, i+stride) of the 8-byte-gram hash.

    Grid sampling alone only discovers repeats whose distance is a
    multiple of the stride (the grams at two grid points of a shifted
    copy differ). Minimizers are the standard alignment-robust sampler
    (winnowing): matching content picks the same minimum regardless of
    where the grid falls, so two copies at ANY distance produce equal
    sampled hashes. The slot-quantized offset is then exact to +-1 slot,
    which the host extension's slide probe resolves."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = blocks.shape
    rows = _rows(B)
    assert stride & (stride - 1) == 0

    def kernel(x_ref, out_ref):
        x = x_ref[...].astype(jnp.uint32)
        gp = jax.lax.broadcasted_iota(jnp.int32, (rows, N), 1)
        h = _hash_tile(x, 8, N, 32, gp)
        out_ref[...] = _winmin_tail(h, stride, gp)

    spec = pl.BlockSpec((rows, N), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.uint32),
        compiler_params=_CP,
        interpret=interpret,
    )(blocks)


@functools.partial(jax.jit, static_argnames=("span_blocks", "stride",
                                             "interpret"))
def ldm_keys(minz: jnp.ndarray, span_blocks: int = 4, stride: int = 32,
             interpret: bool | None = None) -> jnp.ndarray:
    """(B, N) minimizer hashes -> (B/span_blocks, 2*span_samples) uint32
    packed (hash << pbits | combined sample index) LDM sort keys. Each
    output row is [previous span's samples | this span's samples] — the
    sliding context window. Samples arrive as host-strided views and the
    context half as span-row-shifted views (XLA slices/concats feeding a
    Pallas kernel are safe; lane-dim subsampling inside one is not
    expressible)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = minz.shape
    sb = span_blocks
    assert B % sb == 0 and N % stride == 0, (B, sb, N)
    spb = N // stride                # samples per block
    half = sb * spb                  # samples per span (= half a row)
    sps = 2 * half
    pbits = (sps - 1).bit_length()
    hbits = 32 - pbits
    rows = 8 * sb if B % (8 * sb) == 0 else B
    orows = rows // sb

    def kernel(d_ref, c_ref, out_ref):
        # Remix before truncating: a windowed MIN of k hashes is biased
        # small (~log2(k) top bits near zero), so taking its top bits
        # directly would waste hash entropy; an odd-constant multiply
        # re-uniformizes while preserving equality.
        C1 = jnp.uint32(2654435761)
        hd = ((d_ref[...] * C1) >> (32 - hbits)).reshape(orows, half)
        hc = ((c_ref[...] * C1) >> (32 - hbits)).reshape(orows, half)
        cat = jnp.concatenate([hc, hd], axis=1)  # [context | span]
        pos = jax.lax.broadcasted_iota(jnp.uint32, (orows, sps), 1)
        out_ref[...] = (cat << pbits) | pos

    spec = pl.BlockSpec((rows, spb), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    dest = minz[:, ::stride]
    ctx = jnp.concatenate(
        [jnp.full((sb, spb), 0xFFFFFFFF, minz.dtype), dest[:-sb]], axis=0)
    return pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((orows, sps), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // sb, sps), jnp.uint32),
        compiler_params=_CP,
        interpret=interpret,
    )(dest, ctx)


def ldm_unsorted(blocks: jnp.ndarray, span_blocks: int = 4,
                 neighbors: int = 1, interpret: bool | None = None,
                 minz: jnp.ndarray | None = None) -> jnp.ndarray:
    """LDM candidate chain: minimizers -> keys -> sort -> neighbor/
    un-sort keys -> sort. Returns (B/span_blocks, sps) u32, entry j =
    (j << hbits | sample offset) — position-ordered like the short-range
    su arrays. Pass a precomputed minimizer plane (hash_keys_winmin) to
    skip the standalone winmin pass."""
    stride = ldm_stride(span_blocks, blocks.shape[1])
    if minz is None:
        minz = ldm_winmin(blocks, stride, interpret=interpret)
    key = ldm_keys(minz, span_blocks, stride, interpret=interpret)
    pbits = (key.shape[1] - 1).bit_length()
    return _sort_rows(neighbor_unsort_keys(_sort_rows(key), pbits,
                                           neighbors,
                                           interpret=interpret))


def _ldm_est(su: jnp.ndarray, lengths: jnp.ndarray, n: int,
             span_blocks: int, max_off: int):
    """Sample-grid LDM claims from position-ordered LDM keys.

    su: (B/span_blocks, sps) position-ordered LDM keys; the second half
    of each row holds this span's samples (the first half is sliding
    context — candidates only). A sample's candidate survives when >= 2
    consecutive samples chain on the same offset (collision kill + 64 B
    length evidence); its estimate is the chained span (32 bytes per
    unit, up to 2 KiB). Returns (est_b, off_b): (B, spb) int32 chained
    estimates (0 = no claim) and raw byte offsets on the sample grid.
    Traced inside both merge_ldm (full-resolution path) and the fused
    dense compact (slot-plane path)."""
    sb = span_blocks
    stride = ldm_stride(sb, n)
    nspans, sps = su.shape
    half = sps // 2
    spb = half // sb
    B = nspans * sb
    pbits = (sps - 1).bit_length()
    dest = jax.lax.slice(su, (0, half), (nspans, sps))
    offs = (dest & jnp.uint32((1 << (32 - pbits)) - 1)).astype(jnp.int32)

    def shl(a, s, fill):
        return jnp.concatenate(
            [a[:, s:], jnp.full((nspans, s), fill, a.dtype)], axis=1)

    # Chained reach over consecutive samples agreeing on the offset.
    # Minimizer offsets are slot-quantized with +-1 slot jitter (the two
    # copies' minimizers round to floor/ceil slots independently), so
    # agreement is |delta| <= 1, which rules out the doubling trick —
    # use a linear prefix-AND chain instead (reach caps at 6 units).
    reach = (offs > 0).astype(jnp.int32)
    agree = offs > 0
    for k in range(1, 6):
        nxt = shl(offs, k, 0)
        agree = agree & (jnp.abs(nxt - offs) <= 1) & (nxt > 0)
        reach = reach + agree.astype(jnp.int32)
    est = reach * stride
    # >= 2-sample chain evidence; byte offset in [2*stride, max_off] —
    # max_off is the level's frame window (window_log >= 19), so every
    # claim is format-legal (the host slide probe enforces its own
    # window cap); the span geometry bounds reach at
    # 2 * span_blocks * block_size.
    valid = (reach >= 2) & (offs >= 2) \
        & (offs * stride <= max_off)

    est_b = jnp.where(valid, est, 0).reshape(B, spb)
    off_b = (offs * stride).reshape(B, spb)
    posb = jnp.arange(spb, dtype=jnp.int32)[None, :] * stride
    est_b = jnp.where(posb + 40 <= lengths.astype(jnp.int32)[:, None],
                      est_b, 0)
    return est_b, off_b


@functools.partial(jax.jit, static_argnames=("span_blocks", "local_cap",
                                             "max_off"))
def merge_ldm(mlen: jnp.ndarray, moff: jnp.ndarray, su: jnp.ndarray,
              lengths: jnp.ndarray, span_blocks: int, local_cap: int,
              max_off: int = 1 << 19):
    """Fold LDM candidates into the local (mlen, moff) candidate arrays.

    An LDM claim takes a position only where the local estimate is
    shorter AND unsaturated (a saturated local estimate means a long
    nearby match — preferring it keeps offsets small for the entropy
    coder). Offsets are raw byte offsets (exact — the slot contract
    carries 30 offset bits). Full-resolution variant for the parsed
    (non-dense) pipeline; the dense path uses compact_slots_dense."""
    B, N = mlen.shape
    stride = ldm_stride(span_blocks, N)
    est_b, off_b = _ldm_est(su, lengths, N, span_blocks, max_off)
    spb = est_b.shape[1]

    def up(x):  # sample grid -> position grid (zeros off-grid)
        z = jnp.zeros((B, spb, stride - 1), x.dtype)
        return jnp.concatenate([x[:, :, None], z], axis=2).reshape(B, N)

    up_est = up(est_b)
    # Local candidates keep their position when their estimate is
    # saturated (est == local_cap means "at least this long" — usually a
    # long nearby match whose small offset is cheaper), UNLESS the LDM
    # chain shows >= 128 B of evidence: a long-distance match that long
    # beats any short local match regardless of offset cost (RLE runs
    # stay protected by the up_est > mlen test — their exact len1
    # estimate exceeds any LDM chain when genuinely longer).
    take = (up_est > mlen) & ((mlen < local_cap) | (up_est >= 128))
    return (jnp.where(take, up_est, mlen),
            jnp.where(take, up(off_b), moff))


@functools.partial(jax.jit, static_argnames=("window", "span_blocks",
                                             "local_cap", "max_off",
                                             "interpret"))
def compact_slots_dense(mlen: jnp.ndarray, moff: jnp.ndarray, window: int,
                        su: jnp.ndarray | None = None,
                        lengths: jnp.ndarray | None = None,
                        span_blocks: int = 0, local_cap: int = 24,
                        max_off: int = 1 << 19,
                        interpret: bool | None = None):
    """Fused dense-parse + LDM-merge + slot compaction: ONE program from
    the candidate arrays to the (B*nseg, w/4) slot words.

    The dense path has no device parse — every >= MIN_MATCH candidate is
    claimed — so `chosen` never needs to exist: the kernel derives it
    from mlen lanes directly. LDM candidates live only on the sample
    grid (stride >= 32, 32-aligned => subslot k == 0), so the merge that
    merge_ldm performs at full (B, N) resolution collapses to a
    slot-plane override: expand the (B, spb) sample-grid estimates to
    the (B, N/4) slot grid (4x less traffic than the position grid) and
    let an LDM claim take its slot when it beats the local k=0 lane
    under merge_ldm's exact take rule. Saves two full-size dispatches
    (merge_ldm, _dense_chosen) and ~3 full-size HBM round trips —
    measured 1382 -> ~2x MB/s on the L1 dense+ldm4 pipeline."""
    from .match_pipeline import MIN_MATCH

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = mlen.shape
    w = min(window, N)
    nseg = N // w
    rows = _rows(B)
    Ns = N // 4
    ws = w // 4
    has_ldm = su is not None
    if has_ldm:
        stride = ldm_stride(span_blocks, N)
        est_b, off_b = _ldm_est(su, lengths, N, span_blocks, max_off)
        spb = est_b.shape[1]
        sls = Ns // spb  # slots per sample (= stride // 4)

        def up_slot(x):  # sample grid -> slot grid (zeros off-grid)
            z = jnp.zeros((B, spb, sls - 1), x.dtype)
            return jnp.concatenate([x[:, :, None], z], axis=2) \
                .reshape(B, Ns)

        est_s = up_slot(est_b)
        off_s = up_slot(off_b)

    def kernel(*refs):
        ml = [refs[k][...] for k in range(4)]
        of = [refs[4 + k][...] for k in range(4)]
        # Sign-flipped i32 min (Mosaic lacks unsigned reductions):
        # sentinel 0xFFFFFFFF flips to INT32_MAX, claims keep subslot
        # priority order.
        sign = jnp.int32(-0x80000000)
        empty = jnp.int32(0x7FFFFFFF)
        best = jnp.full(ml[0].shape, empty)
        for k in range(4):
            chk = ml[k] >= MIN_MATCH
            keyk = ((jnp.int32(k) << 30) | of[k]) ^ sign
            best = jnp.minimum(best, jnp.where(chk, keyk, empty))
        if has_ldm:
            est = refs[8][...]
            ldo = refs[9][...]
            # merge_ldm's take rule at the k == 0 lane (sample positions
            # are stride-aligned). k == 0 wins the subslot min anyway,
            # so overriding after the reduction is exact.
            take = (est > ml[0]) & ((ml[0] < jnp.int32(local_cap))
                                    | (est >= 128))
            best = jnp.where(take, ldo ^ sign, best)
        out = (best ^ sign).astype(jnp.uint32)
        refs[-1][...] = out.reshape(rows * nseg, ws)

    spec = pl.BlockSpec((rows, Ns), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    ml4 = [mlen[:, k::4].astype(jnp.int32) for k in range(4)]
    of4 = [moff[:, k::4].astype(jnp.int32) for k in range(4)]
    ins = ml4 + of4 + ([est_s, off_s] if has_ldm else [])
    return pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=[spec] * len(ins),
        out_specs=pl.BlockSpec((rows * nseg, ws), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nseg, ws), jnp.uint32),
        compiler_params=_CP,
        interpret=interpret,
    )(*ins)


@functools.partial(jax.jit, static_argnames=("window", "width",
                                             "span_blocks", "local_cap",
                                             "max_off", "interpret"))
def compact_slots_sync(su: jnp.ndarray, window: int, lengths: jnp.ndarray,
                       width: int = 6, su_ldm: jnp.ndarray | None = None,
                       span_blocks: int = 0, local_cap: int = 24,
                       max_off: int = 1 << 19,
                       interpret: bool | None = None):
    """Pair-claim slot compaction for the syncmer pipeline: ONE program
    from the position-ordered pair keys to the (B*nseg, w/4) slot words
    (the same contract compact_slots_dense emits, so the host unpack and
    extension walk are untouched).

    su: (B*nseg, w/2) u32, entry j = (pos << 17 | off) for pair j
    (positions strictly increase pairwise, so sorted order IS pair
    order). Out slot i covers pairs 2i and 2i+1; the smaller-k claim
    wins the subslot, matching the dense kernel's priority. The
    finalize-stage tail guard (pos + width <= block_len) moves here; at
    L1's single width-6 / 32K window the dense cost filter is vacuous
    (mlen>=6 & off<=32768 holds for every hash hit), so no filter
    semantics are lost — the host economics walk is the filter."""
    from .match_pipeline import MIN_MATCH  # noqa: F401  (contract doc)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = lengths.shape[0]
    R, w2 = su.shape
    nseg = R // B
    w = w2 * 2
    N = nseg * w
    Ns = N // 4
    ws = w // 4
    rows = _rows(B)
    pbits = (w - 1).bit_length()
    offbits = 32 - pbits
    has_ldm = su_ldm is not None
    if has_ldm:
        est_b, off_b = _ldm_est(su_ldm, lengths, N, span_blocks, max_off)
        spb = est_b.shape[1]
        sls = Ns // spb

        def up_slot(x):  # sample grid -> slot grid (zeros off-grid)
            z = jnp.zeros((B, spb, sls - 1), x.dtype)
            return jnp.concatenate([x[:, :, None], z], axis=2) \
                .reshape(B, Ns)

        est_s = up_slot(est_b)
        off_s = up_slot(off_b)

    su_blk = su.reshape(B, N // 2)  # contiguous: segments tile the block
    sue = su_blk[:, 0::2]           # pairs 2i   (positions 4i..4i+1)
    suo = su_blk[:, 1::2]           # pairs 2i+1 (positions 4i+2..4i+3)

    def kernel(*refs):
        e_ref, o_ref, len_ref = refs[0], refs[1], refs[2]
        blen = len_ref[...][:, :1]
        gp4 = jax.lax.broadcasted_iota(jnp.int32, (rows, Ns), 1)
        segbase = (gp4 >> (pbits - 2)) << pbits  # (slot // ws) * w
        sign = jnp.int32(-0x80000000)
        empty = jnp.int32(0x7FFFFFFF)
        best = jnp.full((rows, Ns), empty)
        for src_ref in (e_ref, o_ref):
            s = src_ref[...]
            posf = (s >> offbits).astype(jnp.int32)
            off = (s & jnp.uint32((1 << offbits) - 1)).astype(jnp.int32)
            k = posf & 3
            gpos = segbase + posf
            valid = (off > 0) & (gpos + width <= blen)
            keyk = ((k << 30) | off) ^ sign
            best = jnp.minimum(best, jnp.where(valid, keyk, empty))
        if has_ldm:
            est = refs[3][...]
            ldo = refs[4][...]
            # merge_ldm's take rule degenerates here: the sync path has
            # no local length estimate, so ml0 is width (6) or 0 — never
            # saturated at local_cap — and any valid LDM claim (est >=
            # 2*stride >= 64 > width) wins its slot. Kept as the simple
            # comparison; the host extension still byte-verifies and may
            # fall back to rep/local offsets.
            ml0 = jnp.where(best != empty, jnp.int32(width), 0)
            take = est > ml0
            best = jnp.where(take, ldo ^ sign, best)
        out = (best ^ sign).astype(jnp.uint32)
        refs[-1][...] = out.reshape(rows * nseg, ws)

    spec = pl.BlockSpec((rows, Ns), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((rows, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    ins = [sue, suo, lengths.reshape(B, 1).astype(jnp.int32)] \
        + ([est_s, off_s] if has_ldm else [])
    return pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=[spec, spec, len_spec] + [spec] * (2 if has_ldm else 0),
        out_specs=pl.BlockSpec((rows * nseg, ws), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nseg, ws), jnp.uint32),
        compiler_params=_CP,
        interpret=interpret,
    )(*ins)


@functools.partial(jax.jit, static_argnames=("widths", "window",
                                             "span_blocks", "local_cap",
                                             "max_off", "interpret"))
def _dense_tail_fused(sus: tuple, blocks, lengths, minz, widths: tuple,
                      window: int, span_blocks: int, local_cap: int,
                      max_off: int, interpret: bool | None = None):
    """finalize + LDM chain + slot compaction as ONE program.

    On the tunneled dev relay each program dispatch costs ~0.5 ms
    (measured: a trivial 128-byte bump and a 32 MB elementwise pass both
    clock ~0.5-0.6 ms/program), so the split-dispatch pipeline is
    dispatch-rate-bound, not element-bound. Only the two big sorts need
    standalone programs (XLA's single-operand sort fast path dies when
    compiled with producers); everything downstream of the second sort —
    finalize kernel, the whole LDM subchain (keys/sort/neighbor/sort:
    its 0.5 M-element sorts don't need the fast path), and the dense
    compaction — fuses into one dispatch. 10 -> 5 programs per batch."""
    mlen, moff = finalize_candidates(sus, blocks, lengths, widths,
                                     window, 2, interpret=interpret)
    su_l = None
    if span_blocks:
        su_l = ldm_unsorted(blocks, span_blocks, neighbors=1,
                            interpret=interpret, minz=minz)
    return compact_slots_dense(
        mlen, moff, window, su=su_l, lengths=lengths,
        span_blocks=span_blocks, local_cap=local_cap, max_off=max_off,
        interpret=interpret)


@functools.partial(jax.jit, static_argnames=("width", "window",
                                             "span_blocks", "local_cap",
                                             "max_off", "interpret"))
def _sync_tail_fused(su, blocks, lengths, minz, width: int, window: int,
                     span_blocks: int, local_cap: int, max_off: int,
                     interpret: bool | None = None):
    """LDM chain + pair-claim compaction as ONE program (see
    _dense_tail_fused for the dispatch-cost rationale)."""
    su_l = None
    if span_blocks:
        su_l = ldm_unsorted(blocks, span_blocks, neighbors=1,
                            interpret=interpret, minz=minz)
    return compact_slots_sync(
        su, window, lengths, width=width, su_ldm=su_l,
        span_blocks=span_blocks, local_cap=local_cap, max_off=max_off,
        interpret=interpret)


def find_matches_positions(blocks, lengths, widths=(6,),
                           neighbors: int = 1, window: int = 32768,
                           max_seq: int = 16384, parser: str = "pallas",
                           lazy: bool = False, psegs: int = 1,
                           ldm: int = 0, ldm_max_off: int = 1 << 19,
                           dense: bool = False, sync: bool = False,
                           interpret: bool | None = None):
    """Hash-matcher pipeline with the segment-slots device->host contract.

    Returns the slot-word array (B*nseg, w/4) u32: each row is one window
    segment; slot i holds either that 4-byte slot's chosen claim as
    (subslot_k << 30 | byte_offset) — position = 4*i + k — or the empty
    sentinel 0xFFFFFFFF. Slot index == position order, so NO device-side
    sort or merge is needed at all: the host mask-selects claims row-major
    (unpack_segments) and per-segment runs concatenate in block order
    because segments tile the block. Dropping the final compaction sort
    saved ~0.5 ms/batch over the sorted variant; there is no per-segment
    capacity limit and no overflow case (a w-byte segment physically
    holds <= w/4 claims).

    The host reconstructs tiled MIN_MATCH claims from the positions and
    the native extension pass derives exact lengths (see compact_slots).
    This is the production fast-level path; max_seq is unused (kept for
    signature compatibility with the packed-contract pipelines).

    ldm > 0 enables long-distance matching with ldm-block spans (see
    merge_ldm).

    dense=True skips the device parse entirely: EVERY candidate slot is
    claimed (the slot array's size is fixed, so claim density is free on
    the return path) and the host extension walk — which sees true bytes
    — becomes the parse. Measured ~4% better ratio than the est-greedy
    device parse (the estimate-driven parse takes false claims that mask
    real candidates in the following few bytes) and removes the one
    grid-sequential kernel from the pipeline.
    """
    from .match_pipeline import MIN_MATCH, _parse

    if sync:
        # Syncmer speed point: pair-sampled anchors (one key per byte
        # pair, content-selected) halve both dominant sorts; the fused
        # head shares the h8 gram read between the pair selector and the
        # LDM minimizer plane, and the fused tail compacts pair claims +
        # LDM in one program. Single-width dense only (the host
        # extension walk is the parse and the economics filter).
        if not dense or len(widths) != 1:
            raise ValueError("sync implies single-width dense "
                             f"(got dense={dense}, widths={widths})")
        B, N = blocks.shape
        w = min(window, N)
        pbits = (w - 1).bit_length()
        stride = ldm_stride(ldm, N) if ldm else 0  # 0: no minimizer plane
        key, minz = hash_keys_winmin_sync(blocks, widths[0], window,
                                          stride, interpret=interpret)
        su = _sort_rows(neighbor_unsort_keys(
            _sort_rows(key), pbits, neighbors, pos_mask=w - 1,
            interpret=interpret))
        return _sync_tail_fused(
            su, blocks, lengths, minz, width=widths[0], window=window,
            span_blocks=ldm, local_cap=4 * max(widths),
            max_off=ldm_max_off, interpret=interpret)

    if dense and ldm:
        # LDM head fused into the first width's key build (one read of
        # the block bytes feeds both hash planes), LDM tail fused into
        # the slot compaction (see compact_slots_dense).
        B, N = blocks.shape
        w = min(window, N)
        pbits = (w - 1).bit_length()
        stride = ldm_stride(ldm, N)
        sus = []
        minz = None
        for i, width in enumerate(widths):
            if i == 0:
                key, minz = hash_keys_winmin(blocks, width, window, stride,
                                             interpret=interpret)
            else:
                key = hash_keys(blocks, width, window, interpret=interpret)
            sus.append(_sort_rows(neighbor_unsort_keys(
                _sort_rows(key), pbits, neighbors, interpret=interpret)))
        return _dense_tail_fused(
            tuple(sus), blocks, lengths, minz, tuple(widths), window,
            span_blocks=ldm, local_cap=4 * max(widths),
            max_off=ldm_max_off, interpret=interpret)
    mlen, moff = candidates_hash_split(blocks, lengths, widths=widths,
                                       neighbors=neighbors, window=window,
                                       interpret=interpret)
    if dense:
        # Fused tail: dense claim derivation + slot compaction in one
        # program (see compact_slots_dense).
        return compact_slots_dense(
            mlen, moff, window, local_cap=4 * max(widths),
            interpret=interpret)
    if ldm:
        su_l = ldm_unsorted(blocks, ldm, neighbors=1, interpret=interpret)
        mlen, moff = merge_ldm(mlen, moff, su_l, lengths, ldm,
                               local_cap=4 * max(widths),
                               max_off=ldm_max_off)
    if parser == "pallas" or psegs > 1:
        # psegs relies on the kernel's segment-end truncation to keep the
        # >= MIN_MATCH claim spacing invariant, so it always routes through
        # the Pallas parse (interpret mode off-TPU).
        from . import parse_kernel
        chosen = parse_kernel.parse_greedy_pallas(
            mlen, lazy=lazy, psegs=psegs, interpret=interpret)
        chosen = chosen.astype(jnp.int32)
    else:
        chosen = _parse(mlen, parser, lazy).astype(jnp.int32)
    return compact_slots(chosen, moff, window, interpret=interpret)


