#!/usr/bin/env python3
"""Warm the device-entropy pipeline's compile cache and drop the marker
bench.py checks before measuring that mode.

The full on-device entropy pipeline (content matcher + Pallas parse +
FSE/Huffman kernels at the production batch shape) takes tens of
minutes to compile through the dev relay's remote Mosaic path; once
compiled it persists in the repo's jax compilation cache. bench.py's
device_entropy row only runs when this script has succeeded (marker
.jax_cache/DE_WARM), so a cold cache can never stall a bench capture.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    import jax.numpy as jnp
    from qat_zstd_plugin_tpu.runtime.tpu_codec import TpuCodec

    B, N = 64, 131072
    rng = np.random.default_rng(0)
    blocks = jax.device_put(jnp.asarray(
        rng.integers(0, 24, (B, N), np.uint8).astype(np.uint8)))
    lengths = jax.device_put(jnp.full((B,), N, jnp.int32))
    de = TpuCodec(level=1, batch=B, block_size=N, max_seq=16384,
                  device_entropy=True)
    out = de._pipeline()(blocks, lengths)
    _ = int(np.asarray(out[0])[0, 0, 0])  # force execution end to end
    marker = os.path.join(repo, ".jax_cache", "DE_WARM")
    open(marker, "w").write("ok\n")
    print("device-entropy pipeline compiled and cached; marker written")

    # Hybrid mode (device sequence sections + host literals) shares most
    # stages but is its own jit program; warm it too so bench.py's
    # hybrid row can run (marker DE_HYBRID_WARM).
    hy = TpuCodec(level=1, batch=B, block_size=N, max_seq=16384,
                  device_entropy="hybrid")
    out = hy._pipeline()(blocks, lengths)
    _ = int(np.asarray(out[0])[0, 0, 0])
    open(os.path.join(repo, ".jax_cache", "DE_HYBRID_WARM"), "w").write(
        "ok\n")
    print("hybrid device-entropy pipeline cached; marker written")


if __name__ == "__main__":
    main()
