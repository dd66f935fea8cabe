// Native greedy worst-case-mIoU search.
//
// Same algorithm as robseg_tpu/attacks/worst_case.py::worst_case_miou
// (behavioral target: tools/worse_only.py:181-349 of the reference):
// start from attack 0 for every image; for up to n_rounds shuffled passes,
// try every attack per image and accept when the resulting global mIoU
// drops; stop when a full round improves by <= tol.
//
// The Python loop costs O(rounds * N * A * K) interpreted operations —
// minutes for ADE20K-sized inputs; this runs the identical double-precision
// arithmetic natively. The shuffle uses std::mt19937 Fisher-Yates (the
// Python engine uses random.Random — trajectories can differ, minima agree;
// both are deterministic given their seed).
//
// Build: g++ -O3 -shared -fPIC -o libworstcase.so worst_case.cpp

#include <cstdint>
#include <random>
#include <vector>

extern "C" {

// ints/unis: [A, N, K] row-major doubles. selected: out [N] int64.
// Returns the final worst-case mIoU.
double worst_case_miou(const double* ints, const double* unis,
                       int64_t A, int64_t N, int64_t K,
                       int64_t n_rounds, double tol, uint64_t seed,
                       int64_t* selected) {
  std::vector<double> run_int(K, 0.0), run_uni(K, 0.0);
  std::vector<int64_t> order(N);
  for (int64_t i = 0; i < N; ++i) {
    selected[i] = 0;
    order[i] = i;
  }
  auto at = [&](const double* base, int64_t a, int64_t n) {
    return base + (a * N + n) * K;
  };
  for (int64_t n = 0; n < N; ++n) {
    const double* ip = at(ints, 0, n);
    const double* up = at(unis, 0, n);
    for (int64_t k = 0; k < K; ++k) {
      run_int[k] += ip[k];
      run_uni[k] += up[k];
    }
  }
  auto miou = [&](const std::vector<double>& ri,
                  const std::vector<double>& ru) {
    double s = 0.0;
    int64_t c = 0;
    for (int64_t k = 0; k < K; ++k) {
      if (ru[k] > 0.0) {
        s += ri[k] / ru[k];
        ++c;
      }
    }
    return c ? s / static_cast<double>(c) : 0.0;
  };

  double final_miou = miou(run_int, run_uni);
  double prev_best = 10.0;
  std::mt19937_64 rng(seed);
  std::vector<double> cand_i(K), cand_u(K);

  for (int64_t round = 0; round < n_rounds; ++round) {
    // Fisher-Yates shuffle
    for (int64_t i = N - 1; i > 0; --i) {
      std::uniform_int_distribution<int64_t> dist(0, i);
      std::swap(order[i], order[dist(rng)]);
    }
    for (int64_t oi = 0; oi < N; ++oi) {
      int64_t idx = order[oi];
      for (int64_t a = 0; a < A; ++a) {
        const double* ai = at(ints, a, idx);
        const double* au = at(unis, a, idx);
        const double* si = at(ints, selected[idx], idx);
        const double* su = at(unis, selected[idx], idx);
        // candidate running sums + epsilon-scored mIoU over classes with
        // CURRENT union > 0 (parity: worse_only.py:79-93)
        double s = 0.0;
        int64_t c = 0;
        for (int64_t k = 0; k < K; ++k) {
          cand_i[k] = run_int[k] + ai[k] - si[k];
          cand_u[k] = run_uni[k] + au[k] - su[k];
          if (run_uni[k] > 0.0) {
            s += cand_i[k] / (cand_u[k] + 1e-8);
            ++c;
          }
        }
        double est = c ? s / static_cast<double>(c) : 0.0;
        if (est < final_miou) {
          selected[idx] = a;
          run_int = cand_i;
          run_uni = cand_u;
        }
      }
      // threshold refresh after each image (parity: worse_only.py:323-326)
      final_miou = miou(run_int, run_uni);
    }
    if (prev_best - final_miou <= tol) break;
    prev_best = final_miou;
  }
  return final_miou;
}

}  // extern "C"
