// Differential-oracle driver: runs the REFERENCE implementation's own
// predictLinks*Omp functions (headers included from /root/reference via -I;
// nothing is copied into this repo) on a given .mtx and prints one
// "u v score" line per predicted link, 1-indexed as read.
//
// The reference's main.cxx drives a randomized batch sweep (random_device
// seed, main.cxx:191-199), so its end-to-end runs are not reproducible; this
// driver instead scores a PRE-REDUCED graph that the Python test also scores,
// making per-pair differential comparison possible.  Build (see
// tests/test_reference_differential.py):
//   g++ -std=c++17 -O3 -fopenmp -I$REF tests/ref_driver.cxx -o ref_driver
// Usage:
//   ref_driver <graph.mtx> <symmetric 0|1> <metric> <mindeg1> <maxEdges>
// metric in {cn, jaccard, sorensen, salton, hpi, hdi, lhn, aa, ra};
// mindeg1 in {0, 2, 4, 8, 64} (template parameter -> fixed dispatch set).
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <string>
#include "inc/main.hxx"

using std::string;

using K = uint32_t;
using V = float;

template <class R>
static void emit(const R& p) {
  for (const auto& [u, v, w] : p.edges)
    std::printf("%u %u %.9g\n", unsigned(u), unsigned(v), double(w));
}

int main(int argc, char** argv) {
  if (argc < 6) {
    std::fprintf(stderr, "usage: %s <mtx> <symmetric> <metric> <mindeg1> "
                 "<maxEdges>\n", argv[0]);
    return 2;
  }
  char* file = argv[1];
  bool symmetric = std::stoi(argv[2]) != 0;
  string metric = argv[3];
  int deg = std::stoi(argv[4]);
  size_t maxEdges = std::strtoull(argv[5], nullptr, 10);
  omp_set_num_threads(4);
  DiGraph<K, None, V> x;
  readMtxOmpW(x, file, false);
  auto fl = [](auto u) { return true; };
  if (!symmetric) x = symmetrizeOmp(x);
  removeSelfLoopsOmpU(x, fl);
  updateOmpU(x);
  PredictLinkOptions<V> o(1, maxEdges);

#define DISPATCH(name, fn)                                   \
  if (metric == name) {                                      \
    switch (deg) {                                           \
      case 0:  emit(fn<0>(x, o));  return 0;                 \
      case 2:  emit(fn<2>(x, o));  return 0;                 \
      case 4:  emit(fn<4>(x, o));  return 0;                 \
      case 8:  emit(fn<8>(x, o));  return 0;                 \
      case 64: emit(fn<64>(x, o)); return 0;                 \
      default: std::fprintf(stderr, "bad mindeg1\n"); return 2; \
    }                                                        \
  }
  DISPATCH("cn", predictLinksCommonNeighborsOmp)
  DISPATCH("jaccard", predictLinksJaccardCoefficientOmp)
  DISPATCH("sorensen", predictLinksSorensenIndexOmp)
  DISPATCH("salton", predictLinksSaltonCosineSimilarityOmp)
  DISPATCH("hpi", predictLinksHubPromotedOmp)
  DISPATCH("hdi", predictLinksHubDepressedOmp)
  DISPATCH("lhn", predictLinksLeichtHolmeNermanScoreOmp)
  DISPATCH("aa", predictLinksAdamicAdarCoefficientOmp)
  DISPATCH("ra", predictLinksResourceAllocationScoreOmp)
#undef DISPATCH
  std::fprintf(stderr, "unknown metric %s\n", metric.c_str());
  return 2;
}
