"""Device-mesh block parallelism — the scale-out axis of the codec.

The reference's only parallelism is data parallelism over independent
128 KiB blocks: app threads round-robin over up to 64 QAT DC instances
(src/qatseqprod.c:601-630, README.md:138-178), coordinated by an instance
pool spinlock (src/qatseqprod.c:905-933). On TPU there is no lock to take:
blocks shard over a 1-D "blocks" mesh axis with shard_map; per-chip streams
are serialized by XLA, and the "instance shuffle" becomes the block->chip
round-robin implied by the sharding. Cross-host runs initialize through
jax.distributed; compressed sizes ride an ordered all-gather (ICI/DCN
collectives replace the reference's PCIe DMA rings).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import match_pipeline

AXIS = "blocks"


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs.reshape(-1), (AXIS,))


def sharded_pipeline(mesh: Mesh, neighbors: int = 4, max_seq: int = 16384,
                     parser: str = "scan", lazy: bool = False,
                     window: int = 1 << 30):
    """jit'd batched match pipeline sharded over the mesh's block axis.

    Input batch dimension must be divisible by mesh size; each chip runs the
    identical per-block program on its shard (SPMD), no cross-chip traffic
    in the hot loop — matching the reference's share-nothing instances.
    """
    spec = P(AXIS, None)
    in_shardings = (NamedSharding(mesh, spec),
                    NamedSharding(mesh, P(AXIS)))
    out_shardings = {
        "lit_len": NamedSharding(mesh, spec),
        "offset": NamedSharding(mesh, spec),
        "match_len": NamedSharding(mesh, spec),
        "nseq": NamedSharding(mesh, P(AXIS)),
        "last_literals": NamedSharding(mesh, P(AXIS)),
        "overflow": NamedSharding(mesh, P(AXIS)),
    }

    @functools.partial(jax.jit, in_shardings=in_shardings,
                       out_shardings=out_shardings)
    def run(blocks, lengths):
        return match_pipeline.find_matches_batch(
            blocks, lengths, neighbors=neighbors, max_seq=max_seq,
            parser=parser, lazy=lazy, window=window)

    return run


def sharded_positions_step(mesh: Mesh, widths: tuple = (6,),
                           window: int = 32768, ldm: int = 4,
                           sync: bool = True,
                           interpret: bool | None = None):
    """The production fast-level pipeline (hash matcher + minimizer LDM +
    dense slot contract, glue_kernels.find_matches_positions) sharded
    over the block axis with shard_map.

    Each device runs the identical per-shard program (SPMD, no hot-loop
    collectives — the reference's share-nothing instance model). LDM span
    context slides within a shard only: the first span of every shard
    sees empty context, exactly like the first span of a single-chip
    batch, so shard boundaries degrade gracefully to local matching.
    Returns a jitted (blocks, lengths) -> slot-words function.
    """
    from jax.experimental.shard_map import shard_map

    from ..ops import glue_kernels

    def local(blocks, lengths):
        return glue_kernels.find_matches_positions(
            blocks, lengths, widths=widths, window=window,
            ldm=ldm, dense=True, sync=sync, interpret=interpret)

    fn = shard_map(local, mesh=mesh, in_specs=(P(AXIS, None), P(AXIS)),
                   out_specs=P(AXIS, None), check_rep=False)
    return jax.jit(fn)


def compression_step(mesh: Mesh, neighbors: int = 4, max_seq: int = 16384,
                     parser: str = "scan"):
    """Full sharded 'training-step' analog used by the multi-chip dryrun:
    per-chip match pipeline + ordered all-gather of per-block stats.

    The all-gather demonstrates the ordered variable-size collect pattern
    (size-prefixed, max-bound padded) that multi-host frame assembly uses:
    every chip learns every block's nseq/last_literals in frame order.
    """
    pipeline = sharded_pipeline(mesh, neighbors, max_seq, parser)

    @jax.jit
    def gather_stats(out):
        # Replicate per-block scalars to all chips in block order.
        nseq = jax.lax.with_sharding_constraint(
            out["nseq"], NamedSharding(mesh, P(None)))
        lastlit = jax.lax.with_sharding_constraint(
            out["last_literals"], NamedSharding(mesh, P(None)))
        return {"nseq_all": nseq, "last_literals_all": lastlit,
                "total_sequences": nseq.sum()}

    def step(blocks, lengths):
        out = pipeline(blocks, lengths)
        stats = gather_stats({"nseq": out["nseq"],
                              "last_literals": out["last_literals"]})
        return out, stats

    return step
