"""Leveled stderr logging — parity with QZSTD_LOG (src/qatseqprod.c:187-205).

Levels mirror the reference's 0-3 ladder: 0 release (silent), 1 errors,
2 events (device lifecycle, batch dispatch), 3 debug (per-block stats,
sequence dumps). Default from env QZ_DEBUG_LEVEL (the runtime `debugLevel`
global analog; the reference's compile-time -DDEBUGLEVEL becomes an env
var in a Python-first runtime).
"""

from __future__ import annotations

import os
import sys
import threading
import time

LEVEL_RELEASE = 0
LEVEL_ERROR = 1
LEVEL_EVENT = 2
LEVEL_DEBUG = 3

_lock = threading.Lock()
debug_level = int(os.environ.get("QZ_DEBUG_LEVEL", "0"))


def set_level(level: int) -> None:
    global debug_level
    debug_level = level


def log(level: int, fmt: str, *args) -> None:
    if level > debug_level:
        return
    msg = fmt % args if args else fmt
    tag = {1: "ERROR", 2: "EVENT", 3: "DEBUG"}.get(level, "LOG")
    with _lock:
        print(f"[qz:{tag} {time.strftime('%H:%M:%S')}] {msg}",
              file=sys.stderr, flush=True)


def error(fmt: str, *args) -> None:
    log(LEVEL_ERROR, fmt, *args)


def event(fmt: str, *args) -> None:
    log(LEVEL_EVENT, fmt, *args)


def debug(fmt: str, *args) -> None:
    log(LEVEL_DEBUG, fmt, *args)
