"""Mesh-sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def eight_cpu_devices():
    import jax
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("need 8 virtual devices (XLA_FLAGS host device count)")
    return devs[:8]


def test_sharded_matches_unsharded(eight_cpu_devices):
    import jax.numpy as jnp
    from qat_zstd_plugin_tpu.ops import match_pipeline as mp
    from qat_zstd_plugin_tpu.parallel import mesh as pmesh

    B, N = 16, 2048
    rng = np.random.default_rng(0)
    blocks = rng.integers(0, 8, (B, N), np.uint8).astype(np.uint8)
    lengths = np.full(B, N, np.int32)

    mesh = pmesh.make_mesh(eight_cpu_devices)
    run = pmesh.sharded_pipeline(mesh, neighbors=2, max_seq=512)
    out_sharded = {k: np.asarray(v) for k, v in
                   run(jnp.asarray(blocks), jnp.asarray(lengths)).items()}
    out_single = {k: np.asarray(v) for k, v in mp.find_matches_batch(
        jnp.asarray(blocks), jnp.asarray(lengths), neighbors=2,
        max_seq=512).items()}
    for k in out_single:
        assert (out_sharded[k] == out_single[k]).all(), k


def test_dryrun_multichip(eight_cpu_devices):
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_compiles():
    import jax
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    # Slot-words contract: (B*nseg, w/4) u32, claims are non-sentinel.
    arr = np.asarray(out)
    assert arr.shape[0] % args[0].shape[0] == 0
    assert (arr != 0xFFFFFFFF).sum() > 0
