"""Deterministic probe corpora with distinct compositions.

Ratio work (and its regression gates) must never be judged on one corpus
composition (VERDICT r3 #3: the "beats stock" claim was corpus-marginal
at L1 on a different seed). These generators cover the compositions that
stress different parse mechanics:

* text     — short-word natural-language-like data with long-range
             paragraph repeats (short-match economics, rep chains).
* binary   — fixed-stride records, small alphabet, ~2% noise (offset
             coherence: greedy longest-wins churns stride multiples).
* redundant— large verbatim repeats at long distances (LDM reach).
* mixed    — bench.make_corpus's Silesia-like blend (the bench corpus;
             importable here for one-stop access).
"""

from __future__ import annotations

import numpy as np


def corpus_text(nbytes: int, seed: int = 7) -> bytes:
    """Text-heavy: natural-language-like with long-range repeats."""
    rng = np.random.default_rng(seed)
    words = (b"the quick brown fox jumps over the lazy dog "
             b"compression ratio entropy sequence literal match offset "
             b"window frame block stream device kernel lattice ").split()
    paras = []
    while sum(map(len, paras)) < nbytes:
        para = b" ".join(words[i] for i in rng.integers(0, len(words), 600))
        paras.append(para + b"\n\n")
        if rng.random() < 0.3 and paras:  # long-range paragraph repeat
            paras.append(paras[int(rng.integers(0, len(paras)))])
    return b"".join(paras)[:nbytes]


def corpus_binary(nbytes: int, seed: int = 11) -> bytes:
    """Structured binary: fixed-stride records, few distinct values."""
    rng = np.random.default_rng(seed)
    parts = []
    while sum(map(len, parts)) < nbytes:
        stride = int(rng.integers(16, 128))
        rec = rng.integers(0, 64, stride, np.uint8)
        block = np.tile(rec, int(rng.integers(50, 400)))
        noise = rng.integers(0, 256, block.size, np.uint8)
        mask = rng.random(block.size) < 0.02
        block = np.where(mask, noise, block).astype(np.uint8)
        parts.append(block.tobytes())
    return b"".join(parts)[:nbytes]


def corpus_redundant(nbytes: int, seed: int = 13) -> bytes:
    """High-redundancy: big verbatim repeats at long distances."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, nbytes // 8, np.uint8).tobytes()
    parts = [base]
    while sum(map(len, parts)) < nbytes:
        s = int(rng.integers(0, len(base) - 5000))
        ln = int(rng.integers(500, 5000))
        parts.append(base[s:s + ln])
    return b"".join(parts)[:nbytes]


def corpus_mixed(nbytes: int, seed: int = 0) -> bytes:
    """The bench corpus (Silesia-like blend), importable from one place."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench.make_corpus(nbytes, seed=seed)


CORPORA = {
    "text": corpus_text,
    "binary": corpus_binary,
    "redundant": corpus_redundant,
    "mixed": corpus_mixed,
}
