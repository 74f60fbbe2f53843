#!/usr/bin/env python3
"""Benchmark: TPU zstd-codec throughput. Prints ONE JSON line.

Measured rows (mirroring the reference benchmark's -m modes, which put the
software baseline and the accelerator number in the same run —
test/benchmark.c:79,261-266):

* value (primary): device match-pipeline throughput with inputs resident in
  HBM — the TPU analog of the QAT DC engine's rated throughput. Median of
  K dependent-chain samples with spread reported (see BENCH_NOTES.md for
  why block_until_ready cannot be trusted on this relay).
* device_entropy_mbs / device_entropy_ratio: the full on-device entropy
  mode (device emits complete FSE sequence sections + Huffman literals).
* cpu_native_mbs / cpu_native_ratio: the software fallback path (mode-0
  analog), same corpus and level.
* stock_ratio: stock libzstd 1.5.4 at the same level on the same corpus.
* e2e_mbs: end-to-end frame production. On this dev box the host<->device
  link is a tunneled remote TPU (~30-110 MB/s, ~60ms/RPC) so e2e is
  link-bound; on attached hardware it approaches min(device, host entropy).

Correctness gate: the e2e frame must round-trip bit-exactly through stock
libzstd 1.5.4 or the result is reported as invalid.

Baseline: 2000 MB/s/chip L1 encode (BASELINE.md north star).
"""

from __future__ import annotations

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_MBS = 2000.0  # north-star target, BASELINE.md
CORPUS_MB = 64
LEVEL = 1
# Batch sizing: the split-dispatch pipeline (ops/glue_kernels.py) hides
# per-dispatch latency by keeping several batches' intermediates in
# flight. The L1 syncmer point (half-size intermediates) peaks at B=128;
# the full-resolution dense levels serialize past B=64 (in-flight HBM
# budget), so the ladder rows keep B=64.
BATCH = 128
LADDER_BATCH = 64
BLOCK = 131072
K_SAMPLES = 5  # median-of-K with spread (VERDICT r2: report variance)


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


def _chain_timer(run, fetch_scalar):
    """Time K-rep dependent chains closed by a real scalar fetch;
    (chain(5)-chain(1))/4 removes dispatch/fetch latency from the per-rep
    figure (block_until_ready returns early over the axon relay)."""
    def chain(k: int) -> float:
        t0 = time.perf_counter()
        acc = None
        for _ in range(k):
            out = run()
            v = fetch_scalar(out)
            acc = v if acc is None else acc + v
        _ = int(acc)
        return time.perf_counter() - t0
    return chain


def _sample_mbs(chain, nbytes: int, k_samples: int,
                span: int = 16) -> list[float]:
    """Per-rep throughput samples, one Theil-Sen slope per round.

    The chain endpoints each pay one relay RPC whose latency jitters by
    hundreds of ms on a bad day. Each round times chains of k in
    {1, span/3, 2span/3, span} reps and takes the MEDIAN of all pairwise
    slopes (Theil-Sen): a single jittered endpoint corrupts only the
    pairs it touches, where plain two-point differencing let it swamp
    the ~5 ms/rep signal (observed: samples spanning 85..2192 MB/s in
    one capture). Non-positive slopes (jitter exceeding the span) retry.
    The first round after warmup routinely reads low (relay queue
    drain); it is measured and discarded."""
    ks = sorted({1, max(2, 1 + span // 3), max(3, 1 + 2 * span // 3),
                 1 + span})
    # Physical sanity ceiling: the pipeline makes >= ~10 HBM passes over
    # the batch, so >20 GB/s is unconditionally a measurement artifact
    # (observed: a stalled relay queue releasing a whole round at once
    # produced a "95 GB/s" sample).
    CEILING_MBS = 20000.0
    samples: list[float] = []
    retries = 0
    while len(samples) < k_samples + 1 and retries < 3 * k_samples:
        pts = [(k, chain(k)) for k in ks]
        slopes = [(t2 - t1) / (k2 - k1)
                  for i, (k1, t1) in enumerate(pts)
                  for (k2, t2) in pts[i + 1:]]
        slope = float(np.median(slopes))
        if slope <= 0 or nbytes / slope / 1e6 > CEILING_MBS:
            retries += 1
            continue
        samples.append(nbytes / slope / 1e6)
    if not samples:
        # Raising (instead of reporting 0.0 as if measured) routes the
        # capture into _fallback_cpu, which records a truthful row.
        raise RuntimeError("relay too jittery: no positive-slope sample")
    samples = samples[1:] or samples
    # MAD outlier strip: a round whose chains all landed in one stalled
    # relay burst yields a correlated absurd slope; drop samples beyond
    # 4 MADs of the median when enough honest ones remain.
    if len(samples) >= 4:
        med = float(np.median(samples))
        mad = float(np.median([abs(s - med) for s in samples]))
        if mad > 0:
            kept = [s for s in samples if abs(s - med) <= 4 * mad]
            if len(kept) >= 3:
                samples = kept
    return samples


def _median_spread(samples: list[float]) -> tuple[float, float]:
    med = float(np.median(samples))
    spread = (max(samples) - min(samples)) / med if med else 0.0
    return med, spread


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    import jax.numpy as jnp
    from qat_zstd_plugin_tpu.ops import match_pipeline as mp
    from qat_zstd_plugin_tpu.runtime.tpu_codec import TpuCodec, \
        TPU_LEVEL_TABLE
    from qat_zstd_plugin_tpu import oracle

    data = make_corpus(CORPUS_MB << 20)
    buf = np.frombuffer(data, np.uint8)
    params = TPU_LEVEL_TABLE[LEVEL]
    on_tpu = jax.default_backend() == "tpu"
    parser = "pallas" if on_tpu else "scan"

    # --- device-resident pipeline throughput (primary): the positions
    # (segment-slots) contract, the production fast-level path.
    B = BATCH
    blocks_np = np.ascontiguousarray(buf[: B * BLOCK].reshape(B, BLOCK))
    blocks = jax.device_put(jnp.asarray(blocks_np))
    lengths = jax.device_put(jnp.full((B,), BLOCK, jnp.int32))

    def run_dev():
        return mp.find_matches_positions(
            blocks, lengths, widths=params.widths,
            neighbors=params.neighbors, window=params.window,
            max_seq=16384, parser=parser, lazy=params.lazy,
            psegs=params.psegs, ldm=params.ldm, ldm_max_off=1 << 19,
            dense=params.dense, sync=params.sync)

    chain = _chain_timer(run_dev, lambda out: out[0, 0])
    chain(1)  # compile + warm
    samples = _sample_mbs(chain, B * BLOCK, K_SAMPLES)
    dev_mbs, dev_spread = _median_spread(samples)

    # --- device level ladder (L2/L4 at B=64: full-resolution anchors +
    # wider hash widths + larger LDM spans trade speed for ratio).
    ladder = {}
    lb = LADDER_BATCH
    lblocks = jax.device_put(jnp.asarray(
        np.ascontiguousarray(buf[: lb * BLOCK].reshape(lb, BLOCK))))
    llengths = jax.device_put(jnp.full((lb,), BLOCK, jnp.int32))
    for lvl in (2, 4):
        try:
            p = TPU_LEVEL_TABLE[lvl]

            def run_lvl():
                return mp.find_matches_positions(
                    lblocks, llengths, widths=p.widths,
                    neighbors=p.neighbors, window=p.window,
                    max_seq=16384, parser=parser, lazy=p.lazy,
                    psegs=p.psegs, ldm=p.ldm, ldm_max_off=1 << 19,
                    dense=p.dense, sync=p.sync)

            ch = _chain_timer(run_lvl, lambda out: out[0, 0])
            ch(1)
            ss = _sample_mbs(ch, lb * BLOCK, 4, span=8)
            ladder[f"L{lvl}"] = round(_median_spread(ss)[0], 1)
        except Exception as exc:
            print(f"ladder L{lvl} failed: {exc!r}", file=sys.stderr)

    # --- end-to-end frame + device-path ratio, over a 16 MB slice: the
    # tunnel has degraded to ~2 MB/s on bad days, and a 64 MB e2e pass
    # (every input byte crosses the link once) would make the capture
    # take most of an hour. The slice is labeled in `e2e_corpus_mb`.
    e2e_data = data[: min(len(data), 16 << 20)]
    codec = TpuCodec(level=LEVEL, batch=B, block_size=BLOCK, max_seq=16384)
    codec.compress(e2e_data[: B * BLOCK])  # warm the full-batch shape
    t0 = time.perf_counter()
    frame = codec.compress(e2e_data)
    e2e_mbs = len(e2e_data) / (time.perf_counter() - t0) / 1e6
    ok = oracle.roundtrip_ok(frame, e2e_data) if oracle.available() else None

    # --- full on-device entropy mode (device emits complete block bodies).
    # Gated on a cache-warm marker: this pipeline's remote Mosaic compile
    # measured 45+ min on the dev relay, so the row only runs when a prior
    # warm run has populated the persistent jax cache (scripts/warm_de.py
    # writes the marker after succeeding). Without the marker the row
    # reports null rather than risking the whole capture on one compile.
    de_mbs = de_ratio = de_ok = None
    de_marker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache", "DE_WARM")
    try:
        if not os.path.exists(de_marker):
            raise RuntimeError("device-entropy compile cache not warm "
                               "(see scripts/warm_de.py)")
        de_codec = TpuCodec(level=LEVEL, batch=lb, block_size=BLOCK,
                            max_seq=16384, device_entropy=True)
        sub = data[: lb * BLOCK]
        de_frame = de_codec.compress(sub)
        de_ratio = round(len(de_frame) / len(sub), 4)
        de_ok = oracle.roundtrip_ok(de_frame, sub) \
            if oracle.available() else None

        def run_de():
            return de_codec._pipeline()(lblocks, llengths)

        de_chain = _chain_timer(run_de, lambda out: out[0][0, 0, 0])
        de_chain(1)
        # r4 correction: the mode measures ~90-100 MB/s once its stages
        # were profiled separately (the r3 3-18 MB/s readings came from
        # span-3 chains on a jittery relay; BENCH_NOTES.md round-4 lane
        # section) — spans like the other rows are affordable.
        de_samples = _sample_mbs(de_chain, lb * BLOCK, 3, span=6)
        de_mbs = round(_median_spread(de_samples)[0], 1)
    except Exception as exc:  # keep the primary row alive
        print(f"device_entropy row failed: {exc!r}", file=sys.stderr)

    # --- hybrid device-entropy (device FSE sequence sections + host
    # literals — the deployable PCIe-constrained point, VERDICT r4 #6).
    # Same cache-warm gating as the full mode.
    hy_mbs = hy_ratio = hy_ok = None
    hy_marker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache", "DE_HYBRID_WARM")
    try:
        if not os.path.exists(hy_marker):
            raise RuntimeError("hybrid device-entropy compile cache not "
                               "warm (see scripts/warm_de.py)")
        hy_codec = TpuCodec(level=LEVEL, batch=lb, block_size=BLOCK,
                            max_seq=16384, device_entropy="hybrid")
        sub = data[: lb * BLOCK]
        hy_frame = hy_codec.compress(sub)
        hy_ratio = round(len(hy_frame) / len(sub), 4)
        hy_ok = oracle.roundtrip_ok(hy_frame, sub) \
            if oracle.available() else None

        def run_hy():
            return hy_codec._pipeline()(lblocks, llengths)

        hy_chain = _chain_timer(run_hy, lambda out: out[0][0, 0, 0])
        hy_chain(1)
        hy_samples = _sample_mbs(hy_chain, lb * BLOCK, 3, span=6)
        hy_mbs = round(_median_spread(hy_samples)[0], 1)
    except Exception as exc:
        print(f"hybrid device_entropy row failed: {exc!r}", file=sys.stderr)

    # --- software A/B on the same corpus/level (reference -m0 analog).
    # Median-of-5 after a deep warm: this box's spare CPU swings wildly
    # (observed 17->270 MB/s for the same call when relay/driver
    # processes wake), and fresh processes ramp for the first ~2
    # full-size passes (hypervisor steal / cold caches — measured
    # 104 -> 390 MB/s over 5 identical calls in r5), so the warm is two
    # full-size passes and the median spans 5 samples.
    cpu_mbs = cpu_ratio = cpu_spread = None
    cpu_frame = None
    try:
        cpu_codec = TpuCodec(level=LEVEL, use_device=False)
        cpu_codec.compress(e2e_data[: 4 << 20])  # warm: shape + pools
        cpu_codec.compress(e2e_data)             # warm: full-size ramp
        cpu_samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            cpu_frame = cpu_codec.compress(e2e_data)
            cpu_samples.append(
                len(e2e_data) / (time.perf_counter() - t0) / 1e6)
        med, spr = _median_spread(cpu_samples)
        cpu_mbs = round(med, 1)
        cpu_spread = round(spr, 3)
        cpu_ratio = round(len(cpu_frame) / len(e2e_data), 4)
    except Exception as exc:
        print(f"cpu_native row failed: {exc!r}", file=sys.stderr)

    # --- decompression throughput (the reference benchmark times a
    # decompress phase, test/benchmark.c:350-369; decompression is always
    # software there too). Oracle row: stock libzstd decoding our frame.
    # Golden row: the in-repo golden decoder (pure NumPy) on a 2 MB
    # slice — it is the no-libzstd fallback path, so decode-side
    # regressions in either consumer show up across rounds.
    decomp_mbs = decomp_golden_mbs = None
    try:
        dec_frame = cpu_frame if cpu_frame is not None else frame
        if oracle.available():
            oracle.decompress(dec_frame, len(e2e_data))  # warm
            ds = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = oracle.decompress(dec_frame, len(e2e_data))
                ds.append(len(out) / (time.perf_counter() - t0) / 1e6)
            decomp_mbs = round(_median_spread(ds)[0], 1)
    except Exception as exc:
        print(f"decompress row failed: {exc!r}", file=sys.stderr)
    try:
        from qat_zstd_plugin_tpu.golden import decoder as golden_decoder
        gslice = e2e_data[: 2 << 20]
        gframe = (cpu_codec.compress(gslice) if cpu_mbs is not None
                  else codec.compress(gslice))
        t0 = time.perf_counter()
        gout = golden_decoder.decompress(gframe)
        dt = time.perf_counter() - t0
        if bytes(gout) == bytes(gslice):
            decomp_golden_mbs = round(len(gslice) / dt / 1e6, 2)
        else:
            print("golden decoder mismatch on bench frame", file=sys.stderr)
    except Exception as exc:
        print(f"golden decompress row failed: {exc!r}", file=sys.stderr)

    stock_ratio = None
    if oracle.available():
        stock_ratio = round(
            len(oracle.compress(e2e_data, LEVEL)) / len(e2e_data), 4)

    print(json.dumps({
        "metric": f"L{LEVEL} match-pipeline throughput (1 chip, "
                  "HBM-resident)",
        "value": round(dev_mbs, 1),
        "unit": "MB/s",
        "vs_baseline": round(dev_mbs / BASELINE_MBS, 4),
        "spread": round(dev_spread, 4),
        "samples": [round(s, 1) for s in samples],
        "e2e_mbs": round(e2e_mbs, 1),
        "e2e_corpus_mb": len(e2e_data) >> 20,
        "ratio": round(len(frame) / len(e2e_data), 4),
        "roundtrip_bitexact": ok,
        "device_ladder_mbs": ladder,
        "device_entropy_mbs": de_mbs,
        "device_entropy_ratio": de_ratio,
        "device_entropy_bitexact": de_ok,
        "hybrid_entropy_mbs": hy_mbs,
        "hybrid_entropy_ratio": hy_ratio,
        "hybrid_entropy_bitexact": hy_ok,
        "cpu_native_mbs": cpu_mbs,
        "cpu_native_spread": cpu_spread,
        "cpu_native_ratio": cpu_ratio,
        "decompress_mbs": decomp_mbs,
        "decompress_golden_mbs": decomp_golden_mbs,
        "stock_ratio": stock_ratio,
        "corpus_mb": CORPUS_MB,
        "note": "e2e is bound by the tunneled dev link (~30-110 MB/s); "
                "see BENCH_NOTES.md",
    }))


def _fallback_cpu() -> None:
    """Degraded-mode line if the device path is unusable (tunnel wedged,
    compile failure): measure the native CPU path so the driver still
    records a truthful number."""
    import time as _t
    from qat_zstd_plugin_tpu.runtime.tpu_codec import TpuCodec
    from qat_zstd_plugin_tpu import oracle
    data = make_corpus(CORPUS_MB << 20)
    codec = TpuCodec(level=LEVEL, use_device=False)
    codec.compress(data[: 4 << 20])
    t0 = _t.perf_counter()
    frame = codec.compress(data)
    mbs = len(data) / (_t.perf_counter() - t0) / 1e6
    ok = oracle.roundtrip_ok(frame, data) if oracle.available() else None
    stock_ratio = None
    if oracle.available():
        stock_ratio = round(len(oracle.compress(data, LEVEL)) / len(data), 4)
    print(json.dumps({
        "metric": f"L{LEVEL} encode throughput (CPU fallback path; device "
                  "unavailable)",
        "value": round(mbs, 1),
        "unit": "MB/s",
        "vs_baseline": round(mbs / BASELINE_MBS, 4),
        "ratio": round(len(frame) / len(data), 4),
        "stock_ratio": stock_ratio,
        "roundtrip_bitexact": ok,
        "corpus_mb": CORPUS_MB,
    }))


def _run_with_watchdog() -> None:
    """Run the device capture in a child process with a hard deadline.

    The axon relay was observed to stall TCP reads for 30-60 minutes
    (r4); a SIGALRM can't interrupt a C-level grpc recv, so the only
    robust watchdog is a subprocess kill. The child prints the one JSON
    line; on timeout or failure the parent records the truthful CPU
    fallback row instead of hanging the whole capture."""
    import subprocess
    env = dict(os.environ, QZ_BENCH_CHILD="1")
    try:
        deadline = int(os.environ.get("QZ_BENCH_TIMEOUT", "2400"))
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, timeout=deadline, capture_output=True, text=True)
        sys.stderr.write(r.stderr)
        line = ""
        for ln in r.stdout.splitlines():
            if ln.startswith("{"):
                line = ln
        if r.returncode == 0 and line:
            print(line)
            return
        print("bench child failed rc=%d" % r.returncode, file=sys.stderr)
    except subprocess.TimeoutExpired as exc:
        if exc.stderr:
            sys.stderr.write(exc.stderr if isinstance(exc.stderr, str)
                             else exc.stderr.decode(errors="replace"))
        print("bench child timed out (relay stall); CPU fallback row",
              file=sys.stderr)
    _fallback_cpu()


if __name__ == "__main__":
    if os.environ.get("QZ_BENCH_CHILD"):
        try:
            main()
        except Exception:
            import traceback
            traceback.print_exc(file=sys.stderr)
            sys.exit(3)
    else:
        _run_with_watchdog()
