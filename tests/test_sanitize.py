"""ASan/UBSan runs of the native C++ runtime (VERDICT round-1 item #5).

The reference fuzzes its plugin under -fsanitize=undefined,address
(test/fuzzing/Makefile:58). Here the native runtime is rebuilt with both
sanitizers (build.sh asan) and a round-trip battery — matcher, extension,
entropy, xxhash, the multithreaded compressor, plus adversarial fuzz
shapes — runs inside a sanitized subprocess (LD_PRELOAD=libasan: the
sanitizer runtime must be loaded before python itself).
"""

import os
import subprocess
import sys

import pytest

_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "qat_zstd_plugin_tpu", "native")
_ASAN_SO = os.path.join(_DIR, "libqz_entropy_asan.so")

_DRIVER = r"""
import os, sys
import numpy as np
sys.path.insert(0, %(repo)r)
from qat_zstd_plugin_tpu import native, oracle
from qat_zstd_plugin_tpu.format import frame
from qat_zstd_plugin_tpu.format.frame import BlockSequences
assert native.available(), "sanitized native lib failed to load"

rng = np.random.default_rng(0)
rec = rng.integers(0, 256, 96, np.uint8).tobytes()
text = open(%(repo)r + "/SURVEY.md", "rb").read()
corpora = [
    b"", b"a", b"ab" * 3, text, rec * 500,
    bytes(rng.integers(0, 256, 200000, np.uint8).astype(np.uint8)),
    bytes(rng.integers(0, 4, 150000, np.uint8).astype(np.uint8)),
    (text[:5000] + b"\x00" * 5000) * 8,
    bytes(range(256)) * 700,
]
# 1) multithreaded whole-buffer compressor + frame assembly round trip
for i, data in enumerate(corpora):
    buf = np.frombuffer(data, np.uint8)
    bodies = native.compress_blocks_mt(buf, 131072, 8, True,
                                       window_log=19)
    f = frame.assemble_frame(buf, bodies, 131072, True, window_log=19)
    assert oracle.decompress(f, len(data)) == data, i
# 2) matcher + verify-extend + single-block entropy with context
big = (text + rec * 300) * 3
buf = np.frombuffer(big, np.uint8)
bs = 65536
for i in range(len(big) // bs):
    ctx = min(i * bs, 131072)
    cblk = buf[i * bs - ctx:(i + 1) * bs]
    ll, of, ml, last = native.find_sequences(cblk, 8, True, ctx_len=ctx)
    ll, of, ml, last = native.extend_sequences(cblk, ll, of, ml, last,
                                               ctx_len=ctx)
    ll, of, ml, last = native.fill_gaps(cblk, ll, of, ml, last,
                                        ctx_len=ctx)
    body = native.block_body(buf[i * bs:(i + 1) * bs], ll, of, ml, last)
# 3) adversarial sequence inputs into the entropy/extend paths
blk = np.frombuffer(text[:5000], np.uint8)
bad_sets = [
    ([0], [1], [4]),                 # minimal
    ([0, 0], [1, 70000], [4, 8]),    # offset beyond context -> dropped
    ([2500], [2499], [2400]),        # overlapping long match
    ([0], [0], [9]),                 # zero offset -> dropped
]
for ll, of, ml in bad_sets:
    lastlit = len(blk) - sum(ll) - sum(ml)
    if lastlit < 0:
        continue
    native.extend_sequences(blk, np.array(ll), np.array(of),
                            np.array(ml), lastlit)
# 4) xxhash streaming vs one-shot
st = native.Xxh64Stream()
for chunk in range(0, len(big), 77777):
    st.update(buf[chunk:chunk + 77777])
assert st.digest() == native.xxh64(buf)
print("SANITIZED-OK")
"""


@pytest.mark.slow
def test_native_runtime_under_asan_ubsan():
    r = subprocess.run(["sh", os.path.join(_DIR, "build.sh"), "asan"],
                       capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    libasan = subprocess.run(
        ["g++", "-print-file-name=libasan.so"], capture_output=True,
        text=True).stdout.strip()
    if not os.path.isabs(libasan):
        pytest.skip("libasan runtime not found")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               LD_PRELOAD=libasan,
               QZ_NATIVE_LIB=_ASAN_SO,
               ASAN_OPTIONS="detect_leaks=0:abort_on_error=1",
               UBSAN_OPTIONS="halt_on_error=1:print_stacktrace=1")
    r = subprocess.run(
        [sys.executable, "-c", _DRIVER % {"repo": repo}],
        capture_output=True, timeout=600, env=env)
    out = r.stdout.decode()
    err = r.stderr.decode()
    assert r.returncode == 0 and "SANITIZED-OK" in out, (
        out[-1000:], err[-3000:])
