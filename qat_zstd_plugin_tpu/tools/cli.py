"""File compress/decompress CLI — the reference test/test.c analog.

    python -m qat_zstd_plugin_tpu.tools.cli compress INPUT [-o OUT] [-l N]
    python -m qat_zstd_plugin_tpu.tools.cli decompress INPUT [-o OUT]
    python -m qat_zstd_plugin_tpu.tools.cli roundtrip INPUT [-l N]

`roundtrip` mirrors test/test.c:53-146 exactly: compress with the producer
pipeline, decompress with stock zstd, memcmp, print sizes.
"""

from __future__ import annotations

import argparse
import sys
import time


def run(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="qz")
    ap.add_argument("mode", choices=["compress", "decompress", "roundtrip"])
    ap.add_argument("input")
    ap.add_argument("-o", "--output")
    ap.add_argument("-l", "--level", type=int, default=1)
    ap.add_argument("--cpu", action="store_true",
                    help="force the software path (no device)")
    ap.add_argument("--device-entropy", default=None,
                    choices=["off", "hybrid", "full"],
                    help="entropy placement: off = host entropy, "
                         "hybrid = device FSE sequence sections + host "
                         "literals, full = complete device bodies "
                         "(default: QZ_DEVICE_ENTROPY env, else off)")
    args = ap.parse_args(argv)

    import os
    if not os.path.exists(args.input):
        print(f"qz: {args.input}: no such file", file=sys.stderr)
        return 2
    data = open(args.input, "rb").read()
    import qat_zstd_plugin_tpu as qz

    if args.mode == "decompress":
        out = qz.decompress(data)
        dst = args.output or (args.input.removesuffix(".zst")
                              if args.input.endswith(".zst")
                              else args.input + ".out")
        open(dst, "wb").write(out)
        print(f"{args.input}: {len(data)} -> {len(out)} bytes -> {dst}")
        return 0

    use_device = None if not args.cpu else False
    if use_device is None:
        use_device = qz.start_device() == qz.Status.OK
    from qat_zstd_plugin_tpu.runtime.tpu_codec import TpuCodec
    de = {None: None, "off": False, "hybrid": "hybrid",
          "full": True}[args.device_entropy]
    codec = TpuCodec(level=args.level, use_device=use_device,
                     device_entropy=de)
    t0 = time.perf_counter()
    frame = codec.compress(data)
    dt = time.perf_counter() - t0

    if args.mode == "compress":
        dst = args.output or args.input + ".zst"
        open(dst, "wb").write(frame)
        print(f"{args.input}: {len(data)} -> {len(frame)} bytes "
              f"({100 * len(frame) / max(len(data), 1):.1f}%) "
              f"in {dt:.2f}s -> {dst}")
        return 0

    # roundtrip (test/test.c parity): stock zstd decodes, memcmp.
    regen = qz.decompress(frame, len(data))
    ok = regen == data
    print(f"source size: {len(data)}")          # test/test.c prints sizes
    print(f"compressed size: {len(frame)} ({100 * len(frame) / max(len(data), 1):.1f}%)")
    print("round-trip:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(run())
