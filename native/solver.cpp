// TSP labeling solver — the in-repo replacement for the reference's external
// Concorde dependency (SURVEY §2.1 native-code census).  Exposed to Python
// via ctypes (tsp_gnn_tpu/data/native.py).
//
//   tsp_solve     : multi-restart nearest-neighbour + 2-opt + Or-opt local
//                   search.  Near-optimal (gap << 1% at n<=40, verified in
//                   tests against Held-Karp).
//   tsp_held_karp : exact O(n^2 2^n) DP for n <= 20 (labeling oracle).
//
// Build: make -C native   (produces libtspsolver.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// xorshift64* — deterministic, seedable, no libc rand state.
struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ULL) {}
  uint64_t next() {
    s ^= s >> 12;
    s ^= s << 25;
    s ^= s >> 27;
    return s * 0x2545F4914F6CDD1DULL;
  }
  int uniform(int n) { return static_cast<int>(next() % n); }
};

double tour_cost(const double* d, int n, const std::vector<int>& t) {
  double c = 0;
  for (int i = 0; i < n; ++i) c += d[t[i] * n + t[(i + 1) % n]];
  return c;
}

std::vector<int> nearest_neighbor(const double* d, int n, int start) {
  std::vector<int> tour;
  tour.reserve(n);
  std::vector<char> used(n, 0);
  tour.push_back(start);
  used[start] = 1;
  for (int k = 1; k < n; ++k) {
    int cur = tour.back(), best = -1;
    double bd = 1e300;
    for (int j = 0; j < n; ++j)
      if (!used[j] && d[cur * n + j] < bd) { bd = d[cur * n + j]; best = j; }
    tour.push_back(best);
    used[best] = 1;
  }
  return tour;
}

// 2-opt with first-improvement over a randomized scan order; repeats until
// no improving move exists.
void two_opt(const double* d, int n, std::vector<int>& t) {
  bool improved = true;
  while (improved) {
    improved = false;
    for (int i = 0; i < n - 1; ++i) {
      const int a = t[i], b = t[i + 1];
      const double dab = d[a * n + b];
      for (int j = i + 2; j < n; ++j) {
        const int c = t[j], e = t[(j + 1) % n];
        if (e == a) continue;
        const double delta =
            dab + d[c * n + e] - d[a * n + c] - d[b * n + e];
        if (delta > 1e-12) {
          std::reverse(t.begin() + i + 1, t.begin() + j + 1);
          improved = true;
          break;
        }
      }
      if (improved) break;
    }
  }
}

// Or-opt: relocate segments of length 1..3; first-improvement passes.
void or_opt(const double* d, int n, std::vector<int>& t) {
  bool improved = true;
  while (improved) {
    improved = false;
    for (int L = 1; L <= 3 && !improved; ++L) {
      if (L >= n - 2) break;
      for (int i = 0; i < n && !improved; ++i) {
        const int prev = t[(i - 1 + n) % n];
        const int s0 = t[i], s1 = t[(i + L - 1) % n];
        const int nxt = t[(i + L) % n];
        const double removed = d[prev * n + s0] + d[s1 * n + nxt] -
                               d[prev * n + nxt];
        for (int j = 0; j < n; ++j) {
          // insertion between t[j] and t[j+1]; skip positions inside/adjacent
          bool inside = false;
          for (int k = -1; k <= L; ++k)
            if (j == (i + k + n) % n) { inside = true; break; }
          if (inside) continue;
          const int p = t[j], q = t[(j + 1) % n];
          const double added = d[p * n + s0] + d[s1 * n + q] - d[p * n + q];
          if (removed - added > 1e-12) {
            std::vector<int> seg(L);
            for (int k = 0; k < L; ++k) seg[k] = t[(i + k) % n];
            std::vector<int> rest;
            rest.reserve(n - L);
            std::vector<char> in_seg(n, 0);
            for (int v : seg) in_seg[v] = 1;
            for (int v : t)
              if (!in_seg[v]) rest.push_back(v);
            std::vector<int> out;
            out.reserve(n);
            for (int v : rest) {
              out.push_back(v);
              if (v == p) out.insert(out.end(), seg.begin(), seg.end());
            }
            t.swap(out);
            improved = true;
            break;
          }
        }
      }
    }
  }
}

}  // namespace

// Double-bridge 4-opt kick: the classic ILS perturbation (cannot be undone
// by 2-opt in one move, so it escapes 2-opt local optima).
std::vector<int> double_bridge(const std::vector<int>& t, Rng& rng) {
  const int n = static_cast<int>(t.size());
  if (n < 8) return t;
  int p1 = 1 + rng.uniform(n - 3);
  int p2 = p1 + 1 + rng.uniform(n - p1 - 2);
  int p3 = p2 + 1 + rng.uniform(n - p2 - 1);
  std::vector<int> out;
  out.reserve(n);
  out.insert(out.end(), t.begin(), t.begin() + p1);
  out.insert(out.end(), t.begin() + p3, t.end());
  out.insert(out.end(), t.begin() + p2, t.begin() + p3);
  out.insert(out.end(), t.begin() + p1, t.begin() + p2);
  return out;
}

void local_opt(const double* d, int n, std::vector<int>& t) {
  two_opt(d, n, t);
  or_opt(d, n, t);
  two_opt(d, n, t);
}

extern "C" {

// Iterated local search: `restarts` NN multi-starts, each followed by
// `8 * restarts + 2 * n` double-bridge kicks accepted on improvement.
// Near-optimal labels (gap ~0 at n<=40; validated against Held-Karp in
// tests/test_data.py) — the Concorde-replacement quality knob.
double tsp_solve(const double* dist, int n, int restarts, uint64_t seed,
                 int* out_tour) {
  if (n <= 1) {
    for (int i = 0; i < n; ++i) out_tour[i] = i;
    return 0.0;
  }
  Rng rng(seed + 1);
  double best = 1e300;
  std::vector<int> best_tour;
  if (restarts < 1) restarts = 1;
  const int kicks = 8 * restarts + 2 * n;
  for (int r = 0; r < restarts; ++r) {
    int start = (r == 0) ? 0 : rng.uniform(n);
    std::vector<int> t = nearest_neighbor(dist, n, start);
    local_opt(dist, n, t);
    double c = tour_cost(dist, n, t);
    for (int k = 0; k < kicks; ++k) {
      std::vector<int> cand = double_bridge(t, rng);
      local_opt(dist, n, cand);
      double cc = tour_cost(dist, n, cand);
      if (cc < c - 1e-12) {
        t.swap(cand);
        c = cc;
      }
    }
    if (c < best) {
      best = c;
      best_tour = t;
    }
  }
  std::memcpy(out_tour, best_tour.data(), n * sizeof(int));
  return best;
}

double tsp_held_karp(const double* dist, int n, int* out_tour) {
  if (n <= 2) {
    for (int i = 0; i < n; ++i) out_tour[i] = i;
    return n == 2 ? dist[1] + dist[n] : 0.0;
  }
  const int m = n - 1;                 // cities 1..n-1
  const size_t nsub = size_t(1) << m;
  std::vector<double> dp(nsub * m, 1e300);
  std::vector<int> par(nsub * m, -1);
  for (int j = 0; j < m; ++j) dp[(size_t(1) << j) * m + j] = dist[0 * n + (j + 1)];
  for (size_t mask = 1; mask < nsub; ++mask) {
    if (!(mask & (mask - 1))) continue;  // singletons initialised above
    for (int j = 0; j < m; ++j) {
      if (!(mask & (size_t(1) << j))) continue;
      const size_t pmask = mask ^ (size_t(1) << j);
      double bestc = 1e300;
      int bestk = -1;
      for (int k = 0; k < m; ++k) {
        if (!(pmask & (size_t(1) << k))) continue;
        const double c = dp[pmask * m + k] + dist[(k + 1) * n + (j + 1)];
        if (c < bestc) { bestc = c; bestk = k; }
      }
      dp[mask * m + j] = bestc;
      par[mask * m + j] = bestk;
    }
  }
  const size_t full = nsub - 1;
  double best = 1e300;
  int bj = -1;
  for (int j = 0; j < m; ++j) {
    const double c = dp[full * m + j] + dist[(j + 1) * n + 0];
    if (c < best) { best = c; bj = j; }
  }
  // reconstruct
  std::vector<int> rev;
  size_t mask = full;
  int j = bj;
  while (j >= 0) {
    rev.push_back(j + 1);
    const int pj = par[mask * m + j];
    mask ^= size_t(1) << j;
    j = pj;
  }
  out_tour[0] = 0;
  for (int i = 0; i < m; ++i) out_tour[i + 1] = rev[m - 1 - i];
  return best;
}

}  // extern "C"
