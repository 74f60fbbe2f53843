"""Format-layer tests: every emitted frame must decode bit-exactly via stock
libzstd (the reference's oracle strategy, test/test.c:123-131)."""

import numpy as np
import pytest

from qat_zstd_plugin_tpu import oracle
from qat_zstd_plugin_tpu.format import bitstream, frame, fse, huffman, tables
from qat_zstd_plugin_tpu.format.frame import BlockSequences
from qat_zstd_plugin_tpu.format.xxhash import xxh64

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="stock libzstd oracle missing")


def _empty_seqs(n):
    z = np.zeros(0, np.int64)
    return BlockSequences(z, z, z, n)


def _roundtrip_raw(data: bytes):
    n = len(data)
    nblocks = max(1, -(-n // tables.BLOCK_SIZE_MAX))
    f = frame.assemble_frame(data, [None] * nblocks)
    assert oracle.roundtrip_ok(f, data), f"raw frame failed for n={n}"


# ---------------------------------------------------------------- xxhash

def test_xxh64_known_vectors():
    # Published XXH64 test vectors (seed 0).
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    # >32-byte path exercises the 4-lane stripe loop.
    assert xxh64(b"a" * 101) != xxh64(b"a" * 100)


def test_xxh64_matches_oracle_checksum():
    # If our checksum were wrong, checksummed frames would fail decode.
    data = bytes(np.random.default_rng(3).integers(0, 256, 10_000, np.uint8))
    f = frame.assemble_frame(data, [None], checksum=True)
    assert oracle.roundtrip_ok(f, data)


# ---------------------------------------------------------------- bitstream

def test_backward_bitstream_roundtrip():
    w = bitstream.BackwardBitWriter()
    fields = [(5, 3), (0, 1), (1023, 10), (0, 0), (77, 7), (1, 1)]
    for v, nb in fields:
        w.add(v, nb)
    data = w.close()
    r = bitstream.BackwardBitReader(data)
    for v, nb in reversed(fields):
        assert r.read(nb) == v
    assert r.exhausted


def test_forward_bitstream_roundtrip():
    w = bitstream.ForwardBitWriter()
    fields = [(3, 4), (255, 8), (0, 2), (9, 5)]
    for v, nb in fields:
        w.add(v, nb)
    data = w.close()
    r = bitstream.ForwardBitReader(data)
    for v, nb in fields:
        assert r.read(nb) == v


# ---------------------------------------------------------------- fse core

def test_fse_spread_predefined_tables_build():
    for dist, al in [
        (tables.LL_DEFAULT_DIST, tables.LL_DEFAULT_ACCURACY),
        (tables.ML_DEFAULT_DIST, tables.ML_DEFAULT_ACCURACY),
        (tables.OF_DEFAULT_DIST, tables.OF_DEFAULT_ACCURACY),
    ]:
        dt = fse.build_decode_table(dist, al)
        et = fse.build_encode_table(dist, al)
        size = 1 << al
        assert (dt.symbol >= 0).all()
        assert ((et.state_table >= size) & (et.state_table < 2 * size)).all()


def test_fse_ncount_roundtrip():
    for dist, al in [
        (tables.LL_DEFAULT_DIST, tables.LL_DEFAULT_ACCURACY),
        ([10, 16, -1, 0, 0, 2, -1, 2], 5),
        ([1, 1, 30], 5),
    ]:
        data = fse.write_ncount(dist, al)
        norm, got_al, _ = fse.read_ncount(data, 255)
        assert got_al == al
        assert norm[: len(dist)] == list(dist)


def test_fse_encode_decode_selfcheck():
    # Encode a symbol stream, decode with the golden decode table.
    rng = np.random.default_rng(0)
    dist = [8, 8, 8, 4, 2, 1, 1]
    al = 5
    et = fse.build_encode_table(dist, al)
    dt = fse.build_decode_table(dist, al)
    syms = rng.integers(0, 7, 500).tolist()
    w = bitstream.BackwardBitWriter()
    st = fse.FseEncoder(et, syms[-1])
    for s in reversed(syms[:-1]):
        st.encode(s, w)
    st.flush(w)
    r = bitstream.BackwardBitReader(w.close())
    state = r.read(al)
    out = []
    for _ in range(len(syms)):
        out.append(int(dt.symbol[state]))
        nb = int(dt.nb_bits[state])
        if r.bits_remaining >= nb:
            state = int(dt.next_state[state]) + r.read(nb)
    assert out == syms


def test_normalize_counts_sums():
    rng = np.random.default_rng(7)
    for _ in range(50):
        hist = rng.integers(0, 1000, rng.integers(2, 40))
        npresent = int((hist > 0).sum())
        if npresent < 2:
            continue
        al = int(rng.integers(max(5, (npresent - 1).bit_length()), 10))
        norm = fse.normalize_counts(hist, al)
        assert sum(1 if v == -1 else v for v in norm) == (1 << al)
        # Present symbols keep representation; absent stay absent.
        for s, v in enumerate(norm):
            if hist[s] > 0:
                assert v != 0
            else:
                assert v == 0


# ---------------------------------------------------------------- huffman

def test_huffman_kraft_complete():
    rng = np.random.default_rng(11)
    for _ in range(30):
        nsym = int(rng.integers(2, 256))
        hist = np.zeros(256, np.int64)
        idx = rng.choice(256, nsym, replace=False)
        hist[idx] = rng.integers(1, 10_000, nsym)
        t = huffman.build_table(hist)
        present = np.nonzero(hist)[0]
        kraft = sum(2.0 ** -int(t.nb_bits[s]) for s in present)
        assert abs(kraft - 1.0) < 1e-12
        assert t.nb_bits[present].max() <= huffman.MAX_CODE_BITS


# ---------------------------------------------------------------- frames

def test_raw_frames_edge_sizes():
    rng = np.random.default_rng(0)
    for n in [0, 1, 31, 32, 255, 256, 4095, 4096, 65535, 131072, 131073,
              300_000]:
        _roundtrip_raw(bytes(rng.integers(0, 256, n, np.uint8)))


def test_rle_blocks():
    data = b"\x00" * 200_000
    f = frame.assemble_frame(data, [None, None])
    assert oracle.roundtrip_ok(f, data)
    assert len(f) < 40


def test_literals_only_blocks():
    rng = np.random.default_rng(5)
    for n in [16, 300, 1023, 1024, 5000, 131072]:
        # Skewed distribution so huffman engages.
        data = bytes(rng.choice(
            np.frombuffer(b"aaaabbbccdefgh", np.uint8), n).astype(np.uint8))
        body = frame.encode_block_body(
            np.frombuffer(data, np.uint8), _empty_seqs(n))
        f = frame.assemble_frame(data, [body])
        assert oracle.roundtrip_ok(f, data), n
        if n >= 300:
            assert len(f) < n  # must actually compress


def _synthesize_sequences(rng, nseq, max_off=1 << 16, long_tail=False):
    """Build (data, BlockSequences) with valid overlap-aware matches."""
    buf = bytearray(bytes(rng.integers(32, 127, 40, np.uint8)))
    lls, offs, mls = [], [], []
    first_ll = len(buf)
    for i in range(nseq):
        lit = bytes(rng.integers(32, 127, int(rng.integers(0, 30)), np.uint8))
        buf += lit
        off = int(rng.integers(1, min(len(buf), max_off)))
        ml = int(rng.integers(3, 2000 if long_tail else 40))
        for _ in range(ml):
            buf.append(buf[len(buf) - off])
        lls.append(len(lit) + (first_ll if i == 0 else 0))
        offs.append(off)
        mls.append(ml)
        first_ll = 0
    tail = bytes(rng.integers(32, 127, 25, np.uint8))
    buf += tail
    seqs = BlockSequences(np.array(lls), np.array(offs), np.array(mls),
                          len(tail))
    return bytes(buf), seqs


@pytest.mark.parametrize("nseq", [1, 2, 50, 200, 700])
@pytest.mark.parametrize("custom", [False, True])
def test_sequence_blocks(nseq, custom):
    rng = np.random.default_rng(nseq * 2 + custom)
    data, seqs = _synthesize_sequences(rng, nseq)
    if len(data) > tables.BLOCK_SIZE_MAX:
        pytest.skip("synthesized block too large")
    body = frame.encode_block_body(np.frombuffer(data, np.uint8), seqs,
                                   allow_custom_tables=custom)
    f = frame.assemble_frame(data, [body])
    assert oracle.roundtrip_ok(f, data)


def test_long_lengths_and_offsets():
    rng = np.random.default_rng(42)
    data, seqs = _synthesize_sequences(rng, 30, long_tail=True)
    if len(data) > tables.BLOCK_SIZE_MAX:
        data = None
        for trial in range(20):
            rng2 = np.random.default_rng(100 + trial)
            d, s = _synthesize_sequences(rng2, 20, long_tail=True)
            if len(d) <= tables.BLOCK_SIZE_MAX:
                data, seqs = d, s
                break
        assert data is not None
    body = frame.encode_block_body(np.frombuffer(data, np.uint8), seqs)
    f = frame.assemble_frame(data, [body])
    assert oracle.roundtrip_ok(f, data)


def test_rle_sequence_modes():
    # All-same codes force RLE mode for LL/OF/ML tables.
    base = b"0123456789abcdef"
    buf = bytearray(base)
    lls, offs, mls = [], [], []
    for i in range(40):
        off, ml = 16, 8
        for _ in range(ml):
            buf.append(buf[len(buf) - off])
        lls.append(16 if i == 0 else 0)
        offs.append(off)
        mls.append(ml)
    data = bytes(buf)
    seqs = BlockSequences(np.array(lls), np.array(offs), np.array(mls), 0)
    body = frame.encode_block_body(np.frombuffer(data, np.uint8), seqs,
                                   allow_custom_tables=False)
    f = frame.assemble_frame(data, [body])
    assert oracle.roundtrip_ok(f, data)


def test_first_block_rep_history_init():
    """The first block of a frame starts with the spec rep history
    [1, 4, 8] (RFC 8878 3.1.1.5), so offsets 1/4/8 there may use repcode
    values immediately (ADVICE r2). Later blocks cannot (incoming state
    is unknown when blocks encode in parallel)."""
    import numpy as np
    from qat_zstd_plugin_tpu.format import sequences as seqmod
    ll = np.array([5, 3, 7, 4, 6], np.int64)
    of = np.array([4, 1, 8, 4, 1], np.int64)   # all in the initial set
    ml = np.array([10, 9, 12, 8, 11], np.int64)
    first = seqmod.encode_sequences(ll, of, ml, first_block=True)
    later = seqmod.encode_sequences(ll, of, ml, first_block=False)
    assert len(first) < len(later), (len(first), len(later))
    # offset_values must name the slots directly on the first block
    ofv = seqmod.offset_values(of, ll, first_block=True)
    # off=4 is slot 2 (history [1,4,8]); the hit swaps it to front, so
    # off=1 is then slot 2 again ([4,1,8]).
    assert ofv[0] == 2 and ofv[1] == 2
    # and fall back to explicit when history cannot contain the offset
    ofv2 = seqmod.offset_values(of, ll, first_block=False)
    assert ofv2[0] == 4 + 3


def test_first_block_rep_frame_roundtrip_stock():
    """Whole frames whose first block uses initial-history repcodes must
    decode bit-exactly via stock libzstd (golden and native paths)."""
    import numpy as np
    from qat_zstd_plugin_tpu import native, oracle
    from qat_zstd_plugin_tpu.golden import codec as golden_codec
    from qat_zstd_plugin_tpu.runtime.tpu_codec import TpuCodec
    if not oracle.available():
        pytest.skip("oracle missing")
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, 200000, np.uint8).tobytes()
    data = (b"wxyz" * 40)[:161] + noise  # early offset-4 matches, then mix
    f = golden_codec.compress(data, level=1)
    assert oracle.roundtrip_ok(f, data)
    if native.available():
        f2 = TpuCodec(level=1, use_device=False).compress(data)
        assert oracle.roundtrip_ok(f2, data)
