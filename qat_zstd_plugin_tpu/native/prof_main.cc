// Profiling driver for the native software path (gprof harness).
//
// Not part of the shipped library: compiled on demand by
// scripts/profile_native.sh together with qz_entropy.cc (-pg) to
// attribute software-path time between the matcher and the entropy
// stages. Mirrors what qz_compress_blocks_mt does for the benchmark's
// cpu_native row (single-threaded so gprof's flat profile is readable).
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" void qz_compress_blocks_mt(const uint8_t* src, size_t n,
                                      size_t block_size, int chain_depth,
                                      int lazy, int mml, int allow_custom,
                                      int try_huffman, int window_log,
                                      int nthreads, int frame_start,
                                      uint8_t* dst, uint32_t* body_sizes);

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr,
                 "usage: %s FILE [chain_depth lazy mml window_log iters]\n",
                 argv[0]);
    return 2;
  }
  FILE* f = std::fopen(argv[1], "rb");
  if (!f) return 2;
  std::fseek(f, 0, SEEK_END);
  long fn = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> src(static_cast<size_t>(fn));
  if (std::fread(src.data(), 1, src.size(), f) != src.size()) return 2;
  std::fclose(f);
  int chain_depth = argc > 2 ? std::atoi(argv[2]) : 2;
  int lazy = argc > 3 ? std::atoi(argv[3]) : 0;
  int mml = argc > 4 ? std::atoi(argv[4]) : 6;
  int window_log = argc > 5 ? std::atoi(argv[5]) : 19;
  int iters = argc > 6 ? std::atoi(argv[6]) : 3;
  const size_t bs = 131072;
  size_t nblocks = (src.size() + bs - 1) / bs;
  std::vector<uint8_t> dst(nblocks * bs);
  std::vector<uint32_t> sizes(nblocks);
  auto t0 = std::chrono::steady_clock::now();
  for (int it = 0; it < iters; ++it)
    qz_compress_blocks_mt(src.data(), src.size(), bs, chain_depth, lazy,
                          mml, 1, 1, window_log, 1, 1, dst.data(),
                          sizes.data());
  auto t1 = std::chrono::steady_clock::now();
  double s = std::chrono::duration<double>(t1 - t0).count();
  uint64_t comp = 0;
  for (size_t i = 0; i < nblocks; ++i)
    comp += sizes[i] ? sizes[i] : std::min(bs, src.size() - i * bs);
  std::printf("bytes=%zu iters=%d wall=%.3fs rate=%.1f MB/s ratio=%.4f\n",
              src.size(), iters, s,
              src.size() * double(iters) / s / 1e6,
              double(comp) / double(src.size()));
  return 0;
}
