#!/usr/bin/env python3
"""Benchmark: end-to-end zstd-frame encode throughput on the device path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 2000 MB/s/chip L1 encode (BASELINE.md north star).

Methodology mirrors the reference benchmark tool (test/benchmark.c): chunked
compress of a Silesia-like mixed corpus at L1, steady-state timing after a
warm-up pass, ratio + round-trip verification on the side.
"""

from __future__ import annotations

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_MBS = 2000.0  # north-star target, BASELINE.md
CORPUS_MB = 16
LEVEL = 1


def make_corpus(nbytes: int, seed: int = 0) -> bytes:
    """Deterministic Silesia-like mix: text, structured binary, runs,
    high-entropy — plus real system files for realism."""
    rng = np.random.default_rng(seed)
    parts = []
    words = [b"the ", b"of ", b"and ", b"compression ", b"data ", b"block ",
             b"sequence ", b"entropy ", b"offset ", b"window ", b"frame ",
             b"match ", b"literal ", b"stream ", b"device ", b"kernel "]
    for path in ("/root/repo/SURVEY.md", "/bin/ls", "/etc/services"):
        try:
            parts.append(open(path, "rb").read())
        except OSError:
            pass
    while sum(map(len, parts)) < nbytes:
        kind = int(rng.integers(0, 10))
        if kind < 4:  # markov-ish text
            parts.append(b"".join(
                words[i] for i in rng.integers(0, len(words), 2000)))
        elif kind < 6:  # structured records
            rec = rng.integers(0, 256, 64, np.uint8).tobytes()
            parts.append(rec * int(rng.integers(20, 200)))
        elif kind < 8:  # low-entropy binary
            parts.append(rng.integers(0, 16, 8000, np.uint8)
                         .astype(np.uint8).tobytes())
        elif kind < 9:  # runs
            parts.append(bytes([int(rng.integers(0, 256))])
                         * int(rng.integers(100, 4000)))
        else:  # incompressible
            parts.append(rng.integers(0, 256, 4000, np.uint8)
                         .astype(np.uint8).tobytes())
    return b"".join(parts)[:nbytes]


def main() -> None:
    from qat_zstd_plugin_tpu.runtime.tpu_codec import TpuCodec
    from qat_zstd_plugin_tpu import oracle

    data = make_corpus(CORPUS_MB << 20)
    codec = TpuCodec(level=LEVEL, batch=8, block_size=131072,
                     max_seq=16384)

    # Warm-up / compile.
    codec.compress(data[: 8 * 131072])

    t0 = time.perf_counter()
    frame = codec.compress(data)
    dt = time.perf_counter() - t0
    mbs = len(data) / dt / 1e6

    ok = oracle.roundtrip_ok(frame, data) if oracle.available() else None
    ratio = len(frame) / len(data)
    print(json.dumps({
        "metric": f"L{LEVEL} encode throughput (1 chip, e2e frames)",
        "value": round(mbs, 1),
        "unit": "MB/s",
        "vs_baseline": round(mbs / BASELINE_MBS, 4),
        "ratio": round(ratio, 4),
        "roundtrip_bitexact": ok,
        "corpus_mb": CORPUS_MB,
    }))


if __name__ == "__main__":
    main()
