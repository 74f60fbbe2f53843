"""Multi-host scale-out: jax.distributed init + ordered compressed gather.

The reference is single-host (its "interconnect" is PCIe DMA rings,
SURVEY §5); the TPU codec's cross-host story is:

* `init()` — jax.distributed.initialize wrapper (DCN rendezvous);
* block data-parallelism over the global mesh (parallel/mesh.py);
* `gather_compressed()` — the ordered variable-size collect: compressed
  blocks are size-prefixed and padded to a static bound, all-gathered over
  the mesh (ICI within a slice, DCN across hosts), then trimmed host-side
  in frame order. This is the collective that replaces per-instance DMA
  completion ordering in the reference's model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import AXIS


def init(coordinator_address: str | None = None,
         num_processes: int | None = None,
         process_id: int | None = None) -> None:
    """Initialize multi-host JAX (no-op for single-process runs)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def pad_blocks(bodies: list[bytes], bound: int
               ) -> tuple[np.ndarray, np.ndarray]:
    """Size-prefix representation: (n, bound) uint8 padded + (n,) sizes."""
    n = len(bodies)
    out = np.zeros((n, bound), np.uint8)
    sizes = np.zeros((n,), np.int32)
    for i, b in enumerate(bodies):
        assert len(b) <= bound, (len(b), bound)
        out[i, :len(b)] = np.frombuffer(b, np.uint8)
        sizes[i] = len(b)
    return out, sizes


def gather_compressed(mesh, padded: np.ndarray, sizes: np.ndarray
                      ) -> list[bytes]:
    """Ordered all-gather of per-chip compressed blocks.

    `padded`/`sizes` are globally ordered (block i of the stream is row i);
    rows shard over the mesh block axis. Returns every block's exact bytes
    in stream order (identical on every process).
    """
    in_sh = (NamedSharding(mesh, P(AXIS, None)),
             NamedSharding(mesh, P(AXIS)))
    out_sh = (NamedSharding(mesh, P(None, None)),
              NamedSharding(mesh, P(None)))

    @functools.partial(jax.jit, in_shardings=in_sh, out_shardings=out_sh)
    def gather(p, s):
        # with_sharding_constraint to replicated = all-gather over the mesh.
        return (jax.lax.with_sharding_constraint(
                    p, NamedSharding(mesh, P(None, None))),
                jax.lax.with_sharding_constraint(
                    s, NamedSharding(mesh, P(None))))

    gp, gs = gather(jnp.asarray(padded), jnp.asarray(sizes))
    gp = np.asarray(gp)
    gs = np.asarray(gs)
    return [gp[i, :gs[i]].tobytes() for i in range(len(gs))]
