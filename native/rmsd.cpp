// Native symmetry-aware RMSD kernel.
//
// TPU-native equivalent of the evaluation hot loop the reference runs through
// RDKit's C++ GetBestRMS (reference: src/agdiff/utils/chem.py:133-137 and
// covmat.py:16-34): for each (reference, generated) conformer pair, the
// minimum optimal-superposition RMSD over the molecular graph's
// automorphisms.
//
//   * automorphism enumeration: Weisfeiler-Leman color refinement +
//     backtracking over color-compatible candidates (vertex colors = atom
//     labels, edge colors = bond types);
//   * aligned RMSD: Horn's quaternion method (largest eigenvalue of the 4x4
//     K matrix via Jacobi), proper rotations only — identical to Kabsch with
//     determinant correction;
//   * the confusion matrix is OpenMP-parallel over conformer pairs.
//
// C ABI (ctypes): see agdiff_tpu/chem/native_rmsd.py.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// ---------------------------------------------------------------------------
// Horn quaternion RMSD
// ---------------------------------------------------------------------------

// Largest eigenvalue of a symmetric 4x4 matrix by cyclic Jacobi.
double max_eig_sym4(double a[4][4]) {
  for (int sweep = 0; sweep < 50; ++sweep) {
    double off = 0.0;
    for (int p = 0; p < 4; ++p)
      for (int q = p + 1; q < 4; ++q) off += a[p][q] * a[p][q];
    if (off < 1e-22) break;
    for (int p = 0; p < 4; ++p) {
      for (int q = p + 1; q < 4; ++q) {
        if (std::fabs(a[p][q]) < 1e-300) continue;
        const double theta = (a[q][q] - a[p][p]) / (2.0 * a[p][q]);
        const double t =
            (theta >= 0 ? 1.0 : -1.0) /
            (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
        const double c = 1.0 / std::sqrt(t * t + 1.0);
        const double s = t * c;
        for (int k = 0; k < 4; ++k) {
          const double akp = a[k][p], akq = a[k][q];
          a[k][p] = c * akp - s * akq;
          a[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 4; ++k) {
          const double apk = a[p][k], aqk = a[q][k];
          a[p][k] = c * apk - s * aqk;
          a[q][k] = s * apk + c * aqk;
        }
      }
    }
  }
  double m = a[0][0];
  for (int i = 1; i < 4; ++i) m = std::max(m, a[i][i]);
  return m;
}

// RMSD after optimal proper-rotation + translation superposition.
// ref, gen: (n, 3) row-major, ALREADY centered. g2 = sum |gen|^2.
double horn_rmsd_centered(const double* ref, const double* gen, int n,
                          double r2, double g2) {
  // correlation matrix M = gen^T * ref (3x3)
  double M[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
  for (int i = 0; i < n; ++i) {
    const double* p = gen + 3 * i;
    const double* q = ref + 3 * i;
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b) M[a][b] += p[a] * q[b];
  }
  const double Sxx = M[0][0], Sxy = M[0][1], Sxz = M[0][2];
  const double Syx = M[1][0], Syy = M[1][1], Syz = M[1][2];
  const double Szx = M[2][0], Szy = M[2][1], Szz = M[2][2];
  double K[4][4] = {
      {Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx},
      {Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz},
      {Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy},
      {Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz}};
  const double lam = max_eig_sym4(K);
  const double msd = std::max(r2 + g2 - 2.0 * lam, 0.0) / n;
  return std::sqrt(msd);
}

void center_inplace(double* x, int n) {
  double c[3] = {0, 0, 0};
  for (int i = 0; i < n; ++i)
    for (int a = 0; a < 3; ++a) c[a] += x[3 * i + a];
  for (int a = 0; a < 3; ++a) c[a] /= n;
  for (int i = 0; i < n; ++i)
    for (int a = 0; a < 3; ++a) x[3 * i + a] -= c[a];
}

double sumsq(const double* x, int n) {
  double s = 0;
  for (int i = 0; i < 3 * n; ++i) s += x[i] * x[i];
  return s;
}

// ---------------------------------------------------------------------------
// Automorphism enumeration
// ---------------------------------------------------------------------------

struct AutoEnum {
  int n;
  const int* adj;  // n*n edge labels (0 = no edge)
  std::vector<int> colors;
  std::vector<int> order;      // vertex visit order
  std::vector<int> mapping;    // v -> image
  std::vector<char> used;
  std::vector<int>* out;       // flattened perms
  int max_maps;
  int count = 0;

  void refine(const int* labels) {
    colors.assign(labels, labels + n);
    // canonicalize initial labels
    {
      std::map<int, int> table;
      for (int i = 0; i < n; ++i)
        table.emplace(colors[i], (int)table.size());
      for (int i = 0; i < n; ++i) colors[i] = table[colors[i]];
    }
    for (int it = 0; it < 16; ++it) {
      std::vector<std::vector<int>> sigs(n);
      for (int i = 0; i < n; ++i) {
        std::vector<int>& s = sigs[i];
        s.push_back(colors[i]);
        std::vector<std::pair<int, int>> nbr;
        for (int j = 0; j < n; ++j)
          if (adj[i * n + j] > 0) nbr.emplace_back(adj[i * n + j], colors[j]);
        std::sort(nbr.begin(), nbr.end());
        for (auto& pr : nbr) {
          s.push_back(pr.first);
          s.push_back(pr.second);
        }
      }
      std::map<std::vector<int>, int> table;
      std::vector<int> fresh(n);
      for (int i = 0; i < n; ++i) {
        auto r = table.emplace(sigs[i], (int)table.size());
        fresh[i] = r.first->second;
      }
      if (fresh == colors) break;
      colors = fresh;
    }
  }

  void run(const int* labels, std::vector<int>* out_perms, int cap) {
    out = out_perms;
    max_maps = cap;
    refine(labels);
    order.resize(n);
    for (int i = 0; i < n; ++i) order[i] = i;
    std::vector<int> pop(n, 0);
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j)
        if (colors[j] == colors[i]) pop[i]++;
    std::sort(order.begin(), order.end(),
              [&](int a, int b) { return pop[a] < pop[b]; });
    mapping.assign(n, -1);
    used.assign(n, 0);
    backtrack(0);
  }

  void backtrack(int depth) {
    if (count >= max_maps) return;
    if (depth == n) {
      out->insert(out->end(), mapping.begin(), mapping.end());
      ++count;
      return;
    }
    const int v = order[depth];
    for (int w = 0; w < n; ++w) {
      if (used[w] || colors[w] != colors[v]) continue;
      bool ok = true;
      for (int d = 0; d < depth; ++d) {
        const int u = order[d];
        if (adj[v * n + u] != adj[w * n + mapping[u]]) {
          ok = false;
          break;
        }
      }
      if (!ok) continue;
      mapping[v] = w;
      used[w] = 1;
      backtrack(depth + 1);
      used[w] = 0;
      mapping[v] = -1;
      if (count >= max_maps) return;
    }
  }
};

}  // namespace

extern "C" {

// Enumerate automorphisms. Returns count (<= max_maps); perms_out must hold
// max_maps * n ints; perm[i] = image of vertex i.
int agdiff_enumerate_automorphisms(int n, const int* labels, const int* adj,
                                   int max_maps, int* perms_out) {
  std::vector<int> flat;
  AutoEnum e;
  e.n = n;
  e.adj = adj;
  e.run(labels, &flat, max_maps);
  std::memcpy(perms_out, flat.data(), flat.size() * sizeof(int));
  return e.count;
}

// Best-RMSD confusion matrix: out[i*n_gen + j] = min over perms of aligned
// RMSD(refs[i], gens[j][perm]).
void agdiff_rmsd_confusion(int n_atoms, const double* refs, int n_ref,
                           const double* gens, int n_gen, const int* perms,
                           int n_perms, double* out) {
  const int n3 = 3 * n_atoms;
  // center all conformers once
  std::vector<double> R(refs, refs + (size_t)n_ref * n3);
  std::vector<double> G(gens, gens + (size_t)n_gen * n3);
  std::vector<double> r2(n_ref), g2(n_gen);
  for (int i = 0; i < n_ref; ++i) {
    center_inplace(&R[(size_t)i * n3], n_atoms);
    r2[i] = sumsq(&R[(size_t)i * n3], n_atoms);
  }
  for (int j = 0; j < n_gen; ++j) {
    center_inplace(&G[(size_t)j * n3], n_atoms);
    g2[j] = sumsq(&G[(size_t)j * n3], n_atoms);
  }
  // pre-permute each gen conformer for each automorphism (centered copies)
  std::vector<double> GP((size_t)n_gen * n_perms * n3);
  for (int j = 0; j < n_gen; ++j) {
    for (int p = 0; p < n_perms; ++p) {
      const int* perm = perms + (size_t)p * n_atoms;
      double* dst = &GP[((size_t)j * n_perms + p) * n3];
      const double* src = &G[(size_t)j * n3];
      // gen[perm] in numpy: row i of output = row perm[i] of input
      for (int i = 0; i < n_atoms; ++i)
        for (int a = 0; a < 3; ++a) dst[3 * i + a] = src[3 * perm[i] + a];
    }
  }
#ifdef _OPENMP
#pragma omp parallel for collapse(2) schedule(dynamic)
#endif
  for (int i = 0; i < n_ref; ++i) {
    for (int j = 0; j < n_gen; ++j) {
      double best = 1e300;
      for (int p = 0; p < n_perms; ++p) {
        const double r = horn_rmsd_centered(
            &R[(size_t)i * n3], &GP[((size_t)j * n_perms + p) * n3], n_atoms,
            r2[i], g2[j]);
        best = std::min(best, r);
      }
      out[(size_t)i * n_gen + j] = best;
    }
  }
}

// Single best-RMSD (convenience).
double agdiff_best_rmsd(int n_atoms, const double* ref, const double* gen,
                        const int* perms, int n_perms) {
  double out;
  agdiff_rmsd_confusion(n_atoms, ref, 1, gen, 1, perms, n_perms, &out);
  return out;
}

}  // extern "C"
