"""End-to-end mesh compression: sharded match -> host entropy -> ordered
gather -> one frame.

This is the multi-chip/multi-host production shape (SURVEY §7.6): blocks
shard over the mesh's data-parallel axis (the reference's independent-
instance model, src/qatseqprod.c:601-630), each process finishes entropy
for its addressable shard only, and the ordered variable-size gather
(size-prefixed, max-bound padded — parallel/distributed.py) reassembles
every block's bytes in frame order on every process.
"""

from __future__ import annotations

import numpy as np

from .. import native
from ..format import frame, tables
from ..golden import codec as golden_codec
from ..runtime import tpu_codec
from . import distributed
from .mesh import AXIS, make_mesh

BLOCK = tables.BLOCK_SIZE_MAX


def _finish_host(blk: np.ndarray, out_row: dict, level: int
                 ) -> bytes | None:
    """Per-block host side: verify/extend device sequences + entropy."""
    gp = golden_codec.level_params(level)
    seqs = tpu_codec.device_outputs_to_sequences(out_row, 0)
    if seqs is None:
        return None
    if native.available():
        if seqs.nseq:
            ll, of, ml, lastlit = native.extend_sequences(
                blk, seqs.lit_lengths, seqs.offsets, seqs.match_lengths,
                seqs.last_literals)
            seqs = frame.BlockSequences(ll, of, ml, lastlit)
        return native.block_body(
            blk, seqs.lit_lengths, seqs.offsets, seqs.match_lengths,
            seqs.last_literals, gp.custom_tables, gp.huffman)
    try:
        return frame.encode_block_body(blk, seqs,
                                       allow_custom_tables=gp.custom_tables,
                                       try_huffman=gp.huffman)
    except ValueError:
        return None


def compress_mesh(data: bytes | np.ndarray, mesh=None, level: int = 1,
                  checksum: bool = True, max_seq: int = 16384,
                  block_size: int = BLOCK) -> bytes:
    """Compress `data` to one zstd frame with blocks sharded over `mesh`.

    Every participating process must call this with the same data (the
    input is replicated, like a data-parallel step's batch); each process
    computes entropy only for its own device shard, and the gather makes
    the full body list identical everywhere, so every process returns the
    same frame bytes.
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops import match_pipeline

    if mesh is None:
        mesh = make_mesh()
    params = tpu_codec.TPU_LEVEL_TABLE[level]
    gp = golden_codec.level_params(level)
    matcher = params.matcher if native.available() else "content"

    buf = np.frombuffer(data, np.uint8) if not isinstance(
        data, np.ndarray) else np.ascontiguousarray(data, np.uint8)
    n = len(buf)
    bs = block_size
    nblocks = max(1, -(-n // bs))
    nmesh = mesh.devices.size
    # Device batch: full blocks only, padded up to a mesh multiple; the
    # tail block (and any padding rows) take the host path.
    full = [i for i in range(nblocks) if min(n - i * bs, bs) == bs]
    B = max(nmesh, -(-len(full) // nmesh) * nmesh)
    blocks_np = np.zeros((B, bs), np.uint8)
    lengths_np = np.zeros((B,), np.int32)
    for row, i in enumerate(full):
        blocks_np[row] = buf[i * bs:(i + 1) * bs]
        lengths_np[row] = bs

    window = min(params.window, bs)
    run = jax.jit(
        functools.partial(
            match_pipeline.find_matches_packed,
            neighbors=params.neighbors, max_seq=max_seq,
            parser="scan", lazy=params.lazy, stride=params.stride,
            window=window, matcher=matcher, widths=params.widths,
            fused=True),
        in_shardings=(NamedSharding(mesh, P(AXIS, None)),
                      NamedSharding(mesh, P(AXIS))),
        out_shardings=NamedSharding(mesh, P(AXIS, None, None)))
    packed = run(jnp.asarray(blocks_np), jnp.asarray(lengths_np))

    # Host entropy for addressable rows only (per-process work split).
    bodies: dict[int, bytes | None] = {}
    for shard in packed.addressable_shards:
        rows = shard.index[0]
        arr = np.asarray(shard.data)
        out = match_pipeline.unpack_outputs(arr)
        for j in range(arr.shape[0]):
            row = rows.start + j
            if row >= len(full):
                continue
            i = full[row]
            row_view = {k: v[j:j + 1] for k, v in out.items()}
            bodies[i] = _finish_host(buf[i * bs:(i + 1) * bs], row_view,
                                     level)

    # Ordered gather of the compressed bodies (size -1 = raw fallback).
    bound = bs
    local_rows = sorted(bodies)
    padded = np.zeros((len(local_rows), bound), np.uint8)
    sizes = np.full((len(local_rows),), -1, np.int32)
    for k, i in enumerate(local_rows):
        b = bodies[i]
        if b is not None and len(b) <= bound:
            padded[k, :len(b)] = np.frombuffer(b, np.uint8)
            sizes[k] = len(b)
    ids = np.asarray(local_rows, np.int32)
    all_p, all_s, all_i = distributed.gather_rows(mesh, padded, sizes, ids)
    body_list: list[bytes | None] = [None] * nblocks
    for k in range(len(all_i)):
        i = int(all_i[k])
        if all_s[k] >= 0:
            body_list[i] = all_p[k, :all_s[k]].tobytes()
    # Host-only blocks (tail / device-overflow fallback) finish here,
    # identically on every process: the input is replicated and the
    # fallback is deterministic, so frames agree.
    for i in range(nblocks):
        if body_list[i] is None:
            blk = buf[i * bs:min((i + 1) * bs, n)]
            if len(blk) >= 64:
                if native.available():
                    try:
                        ll, of, ml, lastlit = native.find_sequences(
                            blk, gp.chain_depth, gp.lazy, mml=gp.mml)
                        body_list[i] = native.block_body(
                            blk, ll, of, ml, lastlit, gp.custom_tables,
                            gp.huffman)
                    except OverflowError:
                        pass
                else:
                    seqs = golden_codec.compress_block_sequences(blk, level)
                    try:
                        body_list[i] = frame.encode_block_body(
                            blk, seqs,
                            allow_custom_tables=gp.custom_tables,
                            try_huffman=gp.huffman)
                    except ValueError:
                        pass
    return frame.assemble_frame(buf, body_list, bs, checksum)
