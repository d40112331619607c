// SHAKE-style geometry relaxation for the synthetic molecule generators.
//
// Native twin of agdiff_tpu/data/synthetic.py:_relax (the numpy fallback):
// soft O(n^2) repulsion between non-bonded close atoms plus sequential
// Gauss-Seidel projection of distance constraints (both endpoints move,
// preserving ring closure), then repulsion-free polish sweeps where the
// bond constraints get the last word. The Python loop costs ~113 ms per
// Drugs-size molecule (the 8192-molecule arm-I dataset = ~15 min of host
// time); this kernel is the same math in C++ (~100x).
//
// Float semantics: same f64 arithmetic and same loop order as the numpy
// code except numpy's pairwise summation in force.sum(axis=1) — results
// agree to ~1e-12 per iteration and are each bit-deterministic; the
// generators' validity invariants (tests/test_synthetic.py) hold for both.

#include <cmath>
#include <cstring>
#include <vector>

extern "C" {

// pos: (n,3) f64, updated in place.
// constraints / polish: index pairs + target distances.
// exclude: (n,n) row-major 0/1 — pairs exempt from the repulsion term.
void agdiff_relax(int n, double* pos,
                  int n_con, const int* ci, const int* cj, const double* cd,
                  int n_pol, const int* pi_, const int* pj, const double* pd,
                  const unsigned char* exclude,
                  int iters, double step, double repulse) {
    std::vector<double> force(3 * (size_t)n);
    for (int it = 0; it < iters; ++it) {
        // soft repulsion: force[i] += (pos[i]-pos[j]) / max(dist,0.3)^3
        // for non-excluded pairs closer than `repulse`
        std::memset(force.data(), 0, sizeof(double) * 3 * (size_t)n);
        for (int i = 0; i < n; ++i) {
            const double* pi = pos + 3 * (size_t)i;
            for (int j = 0; j < n; ++j) {
                if (j == i || exclude[(size_t)i * n + j]) continue;
                const double* pj2 = pos + 3 * (size_t)j;
                double dx = pi[0] - pj2[0];
                double dy = pi[1] - pj2[1];
                double dz = pi[2] - pj2[2];
                double dist = std::sqrt(dx * dx + dy * dy + dz * dz);
                if (dist >= repulse) continue;
                double d3 = std::max(dist, 0.3);
                double inv = 1.0 / (d3 * d3 * d3);
                force[3 * (size_t)i + 0] += dx * inv;
                force[3 * (size_t)i + 1] += dy * inv;
                force[3 * (size_t)i + 2] += dz * inv;
            }
        }
        for (int i = 0; i < 3 * n; ++i) pos[i] += step * force[i];

        // 4 sequential Gauss-Seidel projection sweeps (simultaneous
        // updates overshoot on shared atoms and diverge)
        for (int s = 0; s < 4; ++s) {
            for (int k = 0; k < n_con; ++k) {
                double* a = pos + 3 * (size_t)ci[k];
                double* b = pos + 3 * (size_t)cj[k];
                double vx = b[0] - a[0], vy = b[1] - a[1], vz = b[2] - a[2];
                double ln = std::sqrt(vx * vx + vy * vy + vz * vz) + 1e-9;
                double f = 0.5 * (ln - cd[k]) / ln;
                a[0] += f * vx; a[1] += f * vy; a[2] += f * vz;
                b[0] -= f * vx; b[1] -= f * vy; b[2] -= f * vz;
            }
        }
    }
    // projection-only polish: repulsion doesn't get the last word on bonds
    for (int s = 0; s < 25; ++s) {
        for (int k = 0; k < n_pol; ++k) {
            double* a = pos + 3 * (size_t)pi_[k];
            double* b = pos + 3 * (size_t)pj[k];
            double vx = b[0] - a[0], vy = b[1] - a[1], vz = b[2] - a[2];
            double ln = std::sqrt(vx * vx + vy * vy + vz * vz) + 1e-9;
            double f = 0.5 * (ln - pd[k]) / ln;
            a[0] += f * vx; a[1] += f * vy; a[2] += f * vz;
            b[0] -= f * vx; b[1] -= f * vy; b[2] -= f * vz;
        }
    }
}

}  // extern "C"
