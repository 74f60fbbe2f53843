"""Multi-process jax.distributed CPU simulation (SURVEY §4d, VERDICT #6).

Two OS processes, each with 4 virtual CPU devices, form one 8-device mesh
via jax.distributed; both run compress_mesh on the same input, each doing
host entropy only for its addressable shard; the ordered gather must make
both emit IDENTICAL frames that stock zstd decodes bit-exactly.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
sys.path.insert(0, %(repo)r)
import numpy as np
from qat_zstd_plugin_tpu.parallel import mesh as pmesh, pipeline as ppipe

assert jax.device_count() == 4 * nproc, jax.device_count()
rng = np.random.default_rng(0)
words = [b"dist ", b"mesh ", b"frame ", b"gather ", b"entropy "]
# 21 full 16 KiB blocks + a tail: >= 2 blocks per virtual device AND an
# uneven real-block count across the two processes (proc0 rows 0-11 all
# real, proc1 rows 12-23 hold 9 real + padding) — the ordered gather's
# ragged path (VERDICT r4 #8; distributed.py gather_rows).
data = b"".join(words[int(k)] for k in rng.integers(0, 5, 60000))
data += rng.integers(0, 256, 9000, np.uint8).tobytes()
mesh = pmesh.make_mesh()
f = ppipe.compress_mesh(data, mesh, level=1, block_size=16384,
                        max_seq=4096)
out = sys.argv[4] + f".{pid}"
open(out, "wb").write(f)
open(out + ".src", "wb").write(data)
# Deep-level (content-path) mesh branch, same parity contract
# (VERDICT r4 #4): L9 = exact-LCP content sorts + hinted host parse.
f9 = ppipe.compress_mesh(data, mesh, level=9, block_size=16384,
                         max_seq=4096)
open(out + ".l9", "wb").write(f9)
print("proc", pid, "frame", len(f), "l9", len(f9))
"""


@pytest.mark.slow
def test_two_process_distributed_frame(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "frame")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER % {"repo": repo},
         str(pid), "2", port, out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, (so.decode()[-500:], se.decode()[-2000:])
    f0 = open(out + ".0", "rb").read()
    f1 = open(out + ".1", "rb").read()
    assert f0 == f1, "processes produced different frames"
    data = open(out + ".0.src", "rb").read()
    from qat_zstd_plugin_tpu import oracle
    assert oracle.decompress(f0, len(data)) == data
    # Mesh-path parity (VERDICT r3 #2): the distributed frame must be
    # within 0.5% of the single-chip device frame on the same input —
    # both run the flagship pipeline and share the host finisher.
    from qat_zstd_plugin_tpu.runtime.tpu_codec import TpuCodec
    single = TpuCodec(level=1, block_size=16384, max_seq=4096,
                      batch=4).compress(data)
    assert len(f0) <= 1.005 * len(single), (len(f0), len(single))
    # Deep-level branch: identical across processes, bit-exact, and at
    # single-chip parity (VERDICT r4 #4 — the content-path mesh branch
    # previously had no parity assertion).
    f9_0 = open(out + ".0.l9", "rb").read()
    f9_1 = open(out + ".1.l9", "rb").read()
    assert f9_0 == f9_1, "processes produced different L9 frames"
    assert oracle.decompress(f9_0, len(data)) == data
    single9 = TpuCodec(level=9, block_size=16384, max_seq=4096,
                       batch=4).compress(data)
    assert len(f9_0) <= 1.005 * len(single9), (len(f9_0), len(single9))
