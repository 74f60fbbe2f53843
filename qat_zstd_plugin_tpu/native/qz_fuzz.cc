// Coverage-guided fuzzer for the native runtime's C ABI.
//
// The reference compiles into zstd's libFuzzer harness
// (test/fuzzing/qatseqprodfuzzer.c:41-74, Makefile:58). This image has no
// clang/libFuzzer, so this is a self-contained equivalent: qz_entropy.cc
// is built with GCC's -fsanitize-coverage=trace-pc (+ASan/UBSan), this
// driver collects edge coverage into a bitmap and runs a classic
// mutate-and-keep-what-covers loop. The oracle is stock libzstd: every
// frame the targets produce must decode bit-exactly, and every
// adversarial claim stream must come out as a valid frame (the
// compressAndVerify trust boundary the device path relies on).
//
// Usage: qz_fuzz <target> <seconds> <corpus_dir>
//   targets: roundtrip | extend | stream | lz4s | mt
// Exit 0 = clean run; ASan/UBSan abort or oracle mismatch = failure, the
// offending input is at <corpus_dir>/last_input.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <dirent.h>
#include <string>
#include <sys/stat.h>
#include <vector>

#include <zstd.h>

extern "C" {
size_t qz_find_sequences(const uint8_t*, size_t, size_t, int, int, int,
                         uint32_t*, uint32_t*, uint32_t*, size_t,
                         uint32_t*);
size_t qz_extend_sequences(const uint8_t*, size_t, size_t, uint32_t*,
                           uint32_t*, uint32_t*, size_t, uint32_t*,
                           size_t);
size_t qz_fill_gaps(const uint8_t*, size_t, size_t, uint32_t*, uint32_t*,
                    uint32_t*, size_t, uint32_t*, size_t, int, int, int,
                    int);
size_t qz_block_body(const uint8_t*, size_t, const uint32_t*,
                     const uint32_t*, const uint32_t*, size_t, uint32_t,
                     int, int, int, uint8_t*, size_t);
size_t qz_dec_lz4s(const uint8_t*, size_t, uint32_t*, uint32_t*,
                   uint32_t*, size_t);
void qz_compress_blocks_mt(const uint8_t*, size_t, size_t, int, int, int,
                           int, int, int, int, int, uint8_t*, uint32_t*);
}

// ---------------------------------------------------------------------------
// Coverage: trace-pc hits hashed into an edge bitmap. The driver file is
// compiled WITHOUT instrumentation so only library edges count.
// ---------------------------------------------------------------------------
static constexpr size_t kMapBits = 1 << 16;
static uint8_t g_map[kMapBits];
static uint8_t g_seen[kMapBits];

extern "C" void __sanitizer_cov_trace_pc() {
  uintptr_t pc = reinterpret_cast<uintptr_t>(
      __builtin_return_address(0));
  g_map[(pc ^ (pc >> 13)) % kMapBits] = 1;
}

static size_t merge_coverage() {  // returns # of new edges
  size_t fresh = 0;
  for (size_t i = 0; i < kMapBits; ++i) {
    if (g_map[i] && !g_seen[i]) {
      g_seen[i] = 1;
      ++fresh;
    }
  }
  return fresh;
}

// ---------------------------------------------------------------------------
// Oracle helpers: single-frame wrap + stock decode.
// ---------------------------------------------------------------------------
static void put32(std::vector<uint8_t>* v, uint32_t x) {
  for (int i = 0; i < 4; ++i) v->push_back((x >> (8 * i)) & 0xFF);
}

static void frame_begin(std::vector<uint8_t>* f, int window_log) {
  put32(f, 0xFD2FB528u);
  f->push_back(0x00);  // FHD: window descriptor follows, no flags
  f->push_back(static_cast<uint8_t>((window_log - 10) << 3));
}

static void frame_block(std::vector<uint8_t>* f, const uint8_t* body,
                        size_t body_len, const uint8_t* raw,
                        size_t raw_len, bool last) {
  uint32_t hdr;
  if (body_len == 0 || body_len >= raw_len) {  // raw block
    hdr = (static_cast<uint32_t>(raw_len) << 3) | (last ? 1 : 0);
    f->push_back(hdr & 0xFF);
    f->push_back((hdr >> 8) & 0xFF);
    f->push_back((hdr >> 16) & 0xFF);
    f->insert(f->end(), raw, raw + raw_len);
  } else {
    hdr = (static_cast<uint32_t>(body_len) << 3) | 4 | (last ? 1 : 0);
    f->push_back(hdr & 0xFF);
    f->push_back((hdr >> 8) & 0xFF);
    f->push_back((hdr >> 16) & 0xFF);
    f->insert(f->end(), body, body + body_len);
  }
}

static bool oracle_check(const std::vector<uint8_t>& frame,
                         const uint8_t* expect, size_t n) {
  std::vector<uint8_t> out(n + 64);
  size_t r = ZSTD_decompress(out.data(), out.size(), frame.data(),
                             frame.size());
  if (ZSTD_isError(r)) {
    fprintf(stderr, "ORACLE: decode error: %s\n", ZSTD_getErrorName(r));
    return false;
  }
  if (r != n || std::memcmp(out.data(), expect, n) != 0) {
    fprintf(stderr, "ORACLE: roundtrip mismatch (%zu vs %zu)\n", r, n);
    return false;
  }
  return true;
}

// ---------------------------------------------------------------------------
// Targets.
// ---------------------------------------------------------------------------
static bool tiling_ok(const uint32_t* ll, const uint32_t* of,
                      const uint32_t* ml, size_t n, uint32_t last,
                      size_t len) {
  uint64_t span = last;
  for (size_t i = 0; i < n; ++i) {
    span += static_cast<uint64_t>(ll[i]) + ml[i];
    uint64_t pos = 0;
    (void)pos;
    if (of[i] == 0 || ml[i] < 3) return false;
  }
  return span == len;
}

// Params carved from the input head so the fuzzer explores level knobs.
struct Params {
  int chain_depth, lazy, mml, custom, huffman;
};
static Params carve(const uint8_t*& p, size_t& n) {
  Params q{2, 0, 4, 1, 1};
  if (n >= 3) {
    q.chain_depth = 1 + (p[0] & 15);
    q.lazy = (p[0] >> 4) & 1;
    q.mml = 4 + (p[1] & 3);
    q.custom = p[2] & 1;
    q.huffman = (p[2] >> 1) & 1;
    p += 3;
    n -= 3;
  }
  return q;
}

static bool target_roundtrip(const uint8_t* data, size_t n) {
  Params q = carve(data, n);
  if (n < 64 || n > 131072) return true;
  size_t cap = n / 3 + 16;
  std::vector<uint32_t> ll(cap), of(cap), ml(cap);
  uint32_t last = 0;
  size_t ns = qz_find_sequences(data, 0, n, q.chain_depth, q.lazy, q.mml,
                                ll.data(), of.data(), ml.data(), cap,
                                &last);
  if (ns == static_cast<size_t>(-1)) return true;  // overflow -> raw
  std::vector<uint8_t> body(n + 1024);
  size_t bl = qz_block_body(data, n, ll.data(), of.data(), ml.data(), ns,
                            last, q.custom, q.huffman, q.mml & 1,
                            body.data(), body.size());
  std::vector<uint8_t> f;
  frame_begin(&f, 19);
  frame_block(&f, body.data(), bl, data, n, true);
  return oracle_check(f, data, n);
}

// Adversarial device claims: arbitrary (lit, off, ml) streams through the
// extension/gap-fill trust boundary must always produce a valid frame.
static bool target_extend(const uint8_t* data, size_t n) {
  Params q = carve(data, n);
  if (n < 96 || n > 131072) return true;
  size_t claim_bytes = n / 4;
  const uint8_t* cl = data;
  size_t blk_len = n - claim_bytes;
  const uint8_t* blk = data + claim_bytes;

  std::vector<uint32_t> ll, of, ml;
  uint64_t span = 0;
  for (size_t i = 0; i + 6 <= claim_bytes && span < blk_len; i += 6) {
    uint32_t l = cl[i] | ((cl[i + 1] & 3) << 8);
    uint32_t o = (cl[i + 2] | (cl[i + 3] << 8) | ((cl[i + 5] & 7) << 16));
    uint32_t m = 3 + (cl[i + 4] | ((cl[i + 5] >> 3) << 8));
    if (span + l + m > blk_len) break;
    ll.push_back(l);
    of.push_back(o);
    ml.push_back(m);
    span += l + m;
  }
  uint32_t last = static_cast<uint32_t>(blk_len - span);
  size_t ns = qz_extend_sequences(blk, 0, blk_len, ll.data(), of.data(),
                                  ml.data(), ll.size(), &last, 1u << 19);
  if (!tiling_ok(ll.data(), of.data(), ml.data(), ns, last, blk_len)) {
    fprintf(stderr, "INVARIANT: extend output does not tile\n");
    return false;
  }
  size_t cap = blk_len / 3 + 16 + ns;
  ll.resize(cap); of.resize(cap); ml.resize(cap);
  size_t n2 = qz_fill_gaps(blk, 0, blk_len, ll.data(), of.data(),
                           ml.data(), ns, &last, cap, q.chain_depth,
                           q.mml, 4, q.mml & 1);  // both economics modes
  if (n2 == static_cast<size_t>(-1)) n2 = ns;
  std::vector<uint8_t> body(blk_len + 1024);
  size_t bl = qz_block_body(blk, blk_len, ll.data(), of.data(), ml.data(),
                            n2, last, q.custom, q.huffman, q.lazy,
                            body.data(), body.size());
  std::vector<uint8_t> f;
  frame_begin(&f, 19);
  frame_block(&f, body.data(), bl, blk, blk_len, true);
  return oracle_check(f, blk, blk_len);
}

// Device-claim ingestion via the LZ4s wire format (the reference's
// accelerator->CPU interop surface, QZSTD_decLz4s): fuzzed bytes are
// split into an LZ4s token stream and block content; the decoded claims
// cross the same extend/gap-fill trust boundary as device claims and
// must always yield a stock-decodable frame. Malformed streams must be
// rejected (SIZE_MAX), never crash.
static bool target_lz4s(const uint8_t* data, size_t n) {
  Params q = carve(data, n);
  if (n < 96 || n > 131072) return true;
  size_t stream_bytes = n / 4;
  const uint8_t* st = data;
  size_t blk_len = n - stream_bytes;
  const uint8_t* blk = data + stream_bytes;
  size_t cap = stream_bytes + 16;
  std::vector<uint32_t> ll(cap), of(cap), ml(cap);
  size_t ns = qz_dec_lz4s(st, stream_bytes, ll.data(), of.data(),
                          ml.data(), cap);
  if (ns == static_cast<size_t>(-1)) return true;  // rejected: fine
  if (ns == 0) return true;
  // The decoded triples tile SOME span; clamp to this block's bytes the
  // way a producer integration would (drop claims past the block, fold
  // the remainder into last-literals).
  uint64_t span = 0;
  size_t keep = 0;
  for (size_t i = 0; i + 1 < ns; ++i) {
    if (span + ll[i] + ml[i] > blk_len) break;
    span += ll[i] + ml[i];
    ++keep;
  }
  uint32_t last = static_cast<uint32_t>(blk_len - span);
  size_t n1 = qz_extend_sequences(blk, 0, blk_len, ll.data(), of.data(),
                                  ml.data(), keep, &last, 1u << 19);
  if (!tiling_ok(ll.data(), of.data(), ml.data(), n1, last, blk_len)) {
    fprintf(stderr, "INVARIANT: lz4s extend output does not tile\n");
    return false;
  }
  std::vector<uint8_t> body(blk_len + 1024);
  size_t bl = qz_block_body(blk, blk_len, ll.data(), of.data(), ml.data(),
                            n1, last, q.custom, q.huffman, 0,
                            body.data(), body.size());
  std::vector<uint8_t> f;
  frame_begin(&f, 19);
  frame_block(&f, body.data(), bl, blk, blk_len, true);
  return oracle_check(f, blk, blk_len);
}

// Streaming producer target: our matcher registered as libzstd's external
// sequence producer, driven through ZSTD_compressStream2 with fuzzed chunk
// sizes and flush points — the integration zstd's stream_round_trip fuzz
// family exercises (reference test/fuzzing/README.md:17-28). Uses the
// experimental API straight from the shared lib (same route the Python
// oracle takes).
struct FzSequence {
  unsigned offset, litLength, matchLength, rep;
};
typedef size_t (*FzSeqProd)(void*, FzSequence*, size_t, const void*, size_t,
                            const void*, size_t, int, size_t);
extern "C" void ZSTD_registerSequenceProducer(ZSTD_CCtx*, void*, FzSeqProd);

static size_t fuzz_produce(void*, FzSequence* out, size_t cap,
                           const void* src, size_t src_size, const void*,
                           size_t dict_size, int clevel, size_t window) {
  const size_t kErr = static_cast<size_t>(-1);
  if (dict_size || src_size > 131072) return kErr;
  if (window < std::min<size_t>(src_size, 32768)) return kErr;
  if (src_size < 16) {
    if (cap < 1) return kErr;
    out[0] = {0, static_cast<unsigned>(src_size), 0, 0};
    return 1;
  }
  // Level-dependent matcher params (the same axes create_seqprod_state
  // spans): fuzzed levels reach the fast single-probe path (depth<=2),
  // the chain matcher, lazy evaluation, and mml 3.
  int depth = clevel <= 2 ? clevel : (clevel < 8 ? 4 : 16);
  int lazy = clevel >= 5 ? 1 : 0;
  int mml = clevel >= 8 ? 3 : 4;
  size_t scap = src_size / 3 + 16;
  std::vector<uint32_t> ll(scap), of(scap), ml(scap);
  uint32_t last = 0;
  size_t ns = qz_find_sequences(static_cast<const uint8_t*>(src), 0,
                                src_size, depth, lazy, mml, ll.data(),
                                of.data(), ml.data(), scap, &last);
  if (ns == static_cast<size_t>(-1) || ns + 1 > cap) return kErr;
  for (size_t i = 0; i < ns; ++i)
    out[i] = {of[i], ll[i], ml[i], 0};
  out[ns] = {0, last, 0, 0};
  return ns + 1;
}

static bool target_stream(const uint8_t* data, size_t n) {
  if (n < 8) return true;
  size_t chunk = 1 + (data[0] | (data[1] << 8));          // 1..65536
  int flush_every = data[2] & 7;                          // 0..7 chunks
  int level = 1 + (data[3] % 12);
  data += 4;
  n -= 4;
  ZSTD_CCtx* c = ZSTD_createCCtx();
  if (!c) return true;
  ZSTD_CCtx_setParameter(c, static_cast<ZSTD_cParameter>(100), level);
  ZSTD_CCtx_setParameter(c, static_cast<ZSTD_cParameter>(1014), 1);
  ZSTD_registerSequenceProducer(c, nullptr, fuzz_produce);
  std::vector<uint8_t> out;
  std::vector<uint8_t> obuf(1 << 16);
  bool ok = true;
  int nchunks = 0;
  for (size_t s = 0; s < n && ok; s += chunk) {
    size_t len = std::min(chunk, n - s);
    ZSTD_inBuffer ib{data + s, len, 0};
    bool lastc = s + len >= n;
    ++nchunks;
    ZSTD_EndDirective mode =
        lastc ? ZSTD_e_end
              : (flush_every && nchunks % flush_every == 0 ? ZSTD_e_flush
                                                           : ZSTD_e_continue);
    while (true) {
      ZSTD_outBuffer ob{obuf.data(), obuf.size(), 0};
      size_t r = ZSTD_compressStream2(c, &ob, &ib, mode);
      if (ZSTD_isError(r)) {
        fprintf(stderr, "STREAM: compress error: %s\n",
                ZSTD_getErrorName(r));
        ok = false;
        break;
      }
      out.insert(out.end(), obuf.data(), obuf.data() + ob.pos);
      if (mode == ZSTD_e_continue ? ib.pos == ib.size : r == 0) break;
    }
  }
  if (n == 0) {  // empty input still needs an end pump
    ZSTD_inBuffer ib{data, 0, 0};
    ZSTD_outBuffer ob{obuf.data(), obuf.size(), 0};
    while (ZSTD_compressStream2(c, &ob, &ib, ZSTD_e_end) != 0) {
    }
    out.insert(out.end(), obuf.data(), obuf.data() + ob.pos);
  }
  ZSTD_freeCCtx(c);
  if (!ok) return false;
  return oracle_check(out, data, n);
}

static bool target_mt(const uint8_t* data, size_t n) {
  Params q = carve(data, n);
  if (n < 64 || n > 131072) return true;
  size_t bs = 4096;
  size_t nb = (n + bs - 1) / bs;
  std::vector<uint8_t> arena(nb * bs);
  std::vector<uint32_t> sizes(nb);
  qz_compress_blocks_mt(data, n, bs, q.chain_depth, q.lazy, q.mml,
                        q.custom, q.huffman, 19, 2, 1, arena.data(),
                        sizes.data());
  std::vector<uint8_t> f;
  frame_begin(&f, 19);
  for (size_t i = 0; i < nb; ++i) {
    size_t len = std::min(bs, n - i * bs);
    frame_block(&f, arena.data() + i * bs, sizes[i], data + i * bs, len,
                i + 1 == nb);
  }
  return oracle_check(f, data, n);
}

// ---------------------------------------------------------------------------
// Mutation engine.
// ---------------------------------------------------------------------------
static uint64_t g_rng = 0x9E3779B97F4A7C15ull;
static uint64_t rnd() {
  g_rng ^= g_rng << 13;
  g_rng ^= g_rng >> 7;
  g_rng ^= g_rng << 17;
  return g_rng;
}

static std::vector<uint8_t> mutate(const std::vector<uint8_t>& in,
                                   const std::vector<std::vector<uint8_t>>&
                                       corpus) {
  std::vector<uint8_t> v = in;
  int rounds = 1 + (rnd() % 8);
  for (int r = 0; r < rounds; ++r) {
    switch (rnd() % 7) {
      case 0:  // bit flip
        if (!v.empty()) v[rnd() % v.size()] ^= 1 << (rnd() % 8);
        break;
      case 1:  // random byte
        if (!v.empty()) v[rnd() % v.size()] = rnd() & 0xFF;
        break;
      case 2: {  // chunk duplicate (creates long-range repeats)
        if (v.size() < 8 || v.size() > 100000) break;
        size_t a = rnd() % v.size();
        size_t len = std::min<size_t>(rnd() % 4096 + 4, v.size() - a);
        size_t at = rnd() % (v.size() + 1);
        v.insert(v.begin() + at, v.begin() + a, v.begin() + a + len);
        break;
      }
      case 3: {  // chunk delete
        if (v.size() < 16) break;
        size_t a = rnd() % (v.size() - 8);
        size_t len = std::min<size_t>(rnd() % 256 + 1, v.size() - a - 8);
        v.erase(v.begin() + a, v.begin() + a + len);
        break;
      }
      case 4: {  // run insert
        size_t at = v.empty() ? 0 : rnd() % v.size();
        v.insert(v.begin() + at, rnd() % 512 + 4,
                 static_cast<uint8_t>(rnd()));
        break;
      }
      case 5: {  // splice with another corpus entry
        if (corpus.empty()) break;
        const auto& o = corpus[rnd() % corpus.size()];
        if (o.empty() || v.empty()) break;
        size_t a = rnd() % v.size(), b = rnd() % o.size();
        v.resize(a);
        v.insert(v.end(), o.begin() + b, o.end());
        break;
      }
      case 6: {  // interesting u16 write (offsets/lengths boundaries)
        if (v.size() < 2) break;
        static const uint16_t kInt[] = {0, 1, 3, 4, 255, 256, 4095, 4096,
                                        32767, 32768, 65535};
        size_t a = rnd() % (v.size() - 1);
        uint16_t x = kInt[rnd() % (sizeof(kInt) / sizeof(kInt[0]))];
        v[a] = x & 0xFF;
        v[a + 1] = x >> 8;
        break;
      }
    }
  }
  if (v.size() > 131072 + 3) v.resize(131072 + 3);
  return v;
}

int main(int argc, char** argv) {
  if (argc < 4) {
    fprintf(stderr,
            "usage: %s <roundtrip|extend|mt|stream> <seconds> <dir>\n",
            argv[0]);
    return 2;
  }
  std::string target = argv[1];
  int seconds = atoi(argv[2]);
  std::string dir = argv[3];
  mkdir(dir.c_str(), 0755);
  bool (*fn)(const uint8_t*, size_t) =
      target == "roundtrip" ? target_roundtrip
      : target == "extend"  ? target_extend
      : target == "stream"  ? target_stream
      : target == "lz4s"    ? target_lz4s
                            : target_mt;

  // Seeds: structured text, runs, random, repeats (aligned + misaligned).
  std::vector<std::vector<uint8_t>> corpus;
  {
    std::vector<uint8_t> s;
    for (int i = 0; i < 20000; ++i)
      s.push_back("the quick brown fox jumps over the lazy dog "
                  [i % 45]);
    corpus.push_back(s);
    std::vector<uint8_t> r(30000);
    for (auto& b : r) b = rnd() & 0xFF;
    std::vector<uint8_t> rep = r;
    rep.insert(rep.end(), r.begin(), r.begin() + 20000);  // aligned dup
    rep.insert(rep.end(), 7, 'x');                        // misalign
    rep.insert(rep.end(), r.begin(), r.begin() + 20000);
    corpus.push_back(r);
    corpus.push_back(rep);
    corpus.push_back(std::vector<uint8_t>(5000, 0));
  }
  // Load persisted corpus.
  if (DIR* d = opendir(dir.c_str())) {
    while (dirent* e = readdir(d)) {
      if (e->d_name[0] == '.') continue;
      std::string p = dir + "/" + e->d_name;
      if (FILE* fp = fopen(p.c_str(), "rb")) {
        std::vector<uint8_t> v;
        uint8_t buf[4096];
        size_t k;
        while ((k = fread(buf, 1, sizeof buf, fp)) > 0)
          v.insert(v.end(), buf, buf + k);
        fclose(fp);
        if (!v.empty()) corpus.push_back(std::move(v));
      }
    }
    closedir(d);
  }

  // Prime coverage with the seeds.
  for (const auto& s : corpus) {
    std::memset(g_map, 0, sizeof g_map);
    if (!fn(s.data(), s.size())) return 1;
    merge_coverage();
  }

  time_t t0 = time(nullptr);
  size_t execs = 0, adds = 0;
  std::string last_path = dir + "/last_input";
  while (time(nullptr) - t0 < seconds) {
    std::vector<uint8_t> v = mutate(corpus[rnd() % corpus.size()], corpus);
    // Persist BEFORE running so an ASan abort leaves the repro on disk.
    if (FILE* fp = fopen(last_path.c_str(), "wb")) {
      fwrite(v.data(), 1, v.size(), fp);
      fclose(fp);
    }
    std::memset(g_map, 0, sizeof g_map);
    if (!fn(v.data(), v.size())) {
      fprintf(stderr, "FAILURE after %zu execs; repro: %s\n", execs,
              last_path.c_str());
      return 1;
    }
    ++execs;
    if (merge_coverage() > 0) {
      char name[64];
      snprintf(name, sizeof name, "/cov_%06zu", adds);
      std::string p = dir + name;
      if (FILE* fp = fopen(p.c_str(), "wb")) {
        fwrite(v.data(), 1, v.size(), fp);
        fclose(fp);
      }
      corpus.push_back(std::move(v));
      ++adds;
    }
  }
  size_t edges = 0;
  for (size_t i = 0; i < kMapBits; ++i) edges += g_seen[i];
  printf("OK target=%s execs=%zu corpus_adds=%zu edges=%zu\n",
         target.c_str(), execs, adds, edges);
  return 0;
}
