// Compiled P2P proxy microbenchmark for the BASELINE anchor derivation.
//
// Measures the per-core throughput (kernel-pairs/s) of a fused near-field
// inner loop of the kind the Rust reference runs per rayon worker
// (ferreus_bbfmm/src/bbfmm.rs:1162-1253): for each target, accumulate
// phi(|t - s|) * w_s over a source tile for NRHS right-hand sides, with
// phi the 3D biharmonic spline (phi(r) = r, the LinearRbf sign convention
// folded into the weights). Auto-vectorised by -O3 -march=native — the
// same advantage the reference's iterator-style Rust gets from LLVM.
//
// This replaces the round-2 anchor's ASSUMED "4x SIMD over numpy" factor
// with a measurement; only the many-core scaling of the reference target
// machine remains assumed (the bench host exposes a single core).
//
// Build: g++ -O3 -march=native -funroll-loops -o p2p_proxy p2p_proxy.cpp
// Run:   ./p2p_proxy [ntargets] [nsources] [reps]   -> JSON on stdout

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

static constexpr int NRHS = 8;

int main(int argc, char** argv) {
  int nt = argc > 1 ? std::atoi(argv[1]) : 512;
  int ns = argc > 2 ? std::atoi(argv[2]) : 4096;
  int reps = argc > 3 ? std::atoi(argv[3]) : 20;

  std::mt19937_64 rng(42);
  std::uniform_real_distribution<double> u(0.0, 1.0);
  std::vector<double> tx(nt), ty(nt), tz(nt);
  std::vector<double> sx(ns), sy(ns), sz(ns);
  std::vector<double> w(static_cast<size_t>(ns) * NRHS);
  std::vector<double> out(static_cast<size_t>(nt) * NRHS, 0.0);
  for (int i = 0; i < nt; i++) { tx[i] = u(rng); ty[i] = u(rng); tz[i] = u(rng); }
  for (int j = 0; j < ns; j++) { sx[j] = u(rng); sy[j] = u(rng); sz[j] = u(rng); }
  for (auto& v : w) v = u(rng) - 0.5;

  double best = 1e100;
  for (int r = 0; r < reps; r++) {
    auto t0 = std::chrono::steady_clock::now();
    for (int i = 0; i < nt; i++) {
      double acc[NRHS] = {0};
      const double xi = tx[i], yi = ty[i], zi = tz[i];
      for (int j = 0; j < ns; j++) {
        const double dx = xi - sx[j], dy = yi - sy[j], dz = zi - sz[j];
        const double phi = std::sqrt(dx * dx + dy * dy + dz * dz);
        const double* wj = &w[static_cast<size_t>(j) * NRHS];
        for (int k = 0; k < NRHS; k++) acc[k] += phi * wj[k];
      }
      for (int k = 0; k < NRHS; k++) out[static_cast<size_t>(i) * NRHS + k] += acc[k];
    }
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    if (dt < best) best = dt;
  }
  // keep `out` observable so the loop is not dead-code-eliminated
  double chk = 0;
  for (auto v : out) chk += v;
  double pairs = static_cast<double>(nt) * ns;
  std::printf(
      "{\"pairs_per_s\": %.6e, \"nt\": %d, \"ns\": %d, \"nrhs\": %d, "
      "\"best_s\": %.6e, \"checksum\": %.6e}\n",
      pairs / best, nt, ns, NRHS, best, chk);
  return 0;
}
