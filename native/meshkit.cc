// meshkit — native host-side mesh/setup kernels for ns_gls_tpu.
//
// The TPU framework's compute path is JAX/XLA; this library covers the
// loop-heavy *host* runtime the reference gets from deal.II/p4est in C++:
// topology extraction, node dedup/gather-map construction, constraint
// chain resolution, and point location (inverse isoparametric mapping).
// Bound via ctypes (ns_gls_tpu/utils/native.py) with numpy fallbacks.
//
// Build: cd native && make   (produces libmeshkit.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// Sorted-unique of int64 key rows: the kernel behind vertex/node dedup
// and unique-edge/face extraction.
//   keys:   n x width int64 (row-major)
//   out_ids: n  (for each row, the id of its unique representative,
//            ids ordered by first occurrence)
// returns: number of unique rows
// ---------------------------------------------------------------------
int64_t mk_unique_rows(const int64_t* keys, int64_t n, int64_t width,
                       int64_t* out_ids) {
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  auto less = [&](int64_t a, int64_t b) {
    const int64_t* ra = keys + a * width;
    const int64_t* rb = keys + b * width;
    for (int64_t w = 0; w < width; ++w) {
      if (ra[w] != rb[w]) return ra[w] < rb[w];
    }
    return a < b;  // stable tie-break: first occurrence first
  };
  std::sort(order.begin(), order.end(), less);

  auto equal = [&](int64_t a, int64_t b) {
    return std::memcmp(keys + a * width, keys + b * width,
                       sizeof(int64_t) * width) == 0;
  };

  // group ids in sorted order, representative = first occurrence
  std::vector<int64_t> rep(n);
  int64_t group_start = 0;
  for (int64_t i = 1; i <= n; ++i) {
    if (i == n || !equal(order[i], order[group_start])) {
      int64_t first = order[group_start];
      for (int64_t j = group_start; j < i; ++j) {
        first = std::min(first, order[j]);
      }
      for (int64_t j = group_start; j < i; ++j) rep[order[j]] = first;
      group_start = i;
    }
  }
  // number unique representatives by first occurrence
  std::vector<int64_t> id_of_rep(n, -1);
  int64_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (rep[i] == i) id_of_rep[i] = next++;
  }
  for (int64_t i = 0; i < n; ++i) out_ids[i] = id_of_rep[rep[i]];
  return next;
}

// ---------------------------------------------------------------------
// Transpose gather-map construction: invert cell_nodes (n_c x n_loc,
// int32) into per-node contribution lists.
//   counts:   n_nodes (out) contribution counts
//   order:    n_c*n_loc (out) slot ids sorted by node (stable)
// ---------------------------------------------------------------------
void mk_transpose_map(const int32_t* cell_nodes, int64_t n_slots,
                      int64_t n_nodes, int64_t* counts, int64_t* order) {
  std::fill(counts, counts + n_nodes, 0);
  for (int64_t s = 0; s < n_slots; ++s) counts[cell_nodes[s]]++;
  std::vector<int64_t> cursor(n_nodes + 1, 0);
  std::partial_sum(counts, counts + n_nodes, cursor.begin() + 1);
  for (int64_t s = 0; s < n_slots; ++s) {
    order[cursor[cell_nodes[s]]++] = s;
  }
}

// ---------------------------------------------------------------------
// Constraint chain resolution (AffineConstraints::close equivalent):
// lines given in CSR-ish form; resolves chains so no column is itself
// constrained.  Fixed-point substitution, max `max_depth` rounds.
//   rows:      n_lines sorted dof ids
//   indptr:    n_lines+1
//   cols/wts:  entries
//   out_*:     resolved CSR (capacity must be passed in; returns nnz or
//              -1 if capacity exceeded, -2 if chain too deep)
// ---------------------------------------------------------------------
int64_t mk_resolve_chains(const int64_t* rows, int64_t n_lines,
                          const int64_t* indptr, const int64_t* cols,
                          const double* wts, const double* inhom,
                          int64_t capacity, int64_t* out_indptr,
                          int64_t* out_cols, double* out_wts,
                          double* out_inhom) {
  // map dof -> line index
  auto find_line = [&](int64_t dof) -> int64_t {
    const int64_t* it = std::lower_bound(rows, rows + n_lines, dof);
    if (it != rows + n_lines && *it == dof) return it - rows;
    return -1;
  };

  std::vector<std::vector<std::pair<int64_t, double>>> resolved(n_lines);
  std::vector<double> resolved_inhom(n_lines, 0.0);
  std::vector<int8_t> done(n_lines, 0);

  // iterative resolution with explicit stack (avoids deep recursion)
  for (int64_t i = 0; i < n_lines; ++i) {
    if (done[i]) continue;
    std::vector<int64_t> stack = {i};
    int guard = 0;
    while (!stack.empty()) {
      if (++guard > 1 << 22) return -2;
      int64_t l = stack.back();
      if (done[l]) {
        stack.pop_back();
        continue;
      }
      bool ready = true;
      for (int64_t e = indptr[l]; e < indptr[l + 1]; ++e) {
        int64_t sub = find_line(cols[e]);
        if (sub >= 0 && !done[sub]) {
          stack.push_back(sub);
          ready = false;
        }
      }
      if (!ready) continue;
      // combine
      std::vector<std::pair<int64_t, double>> acc;
      double b = inhom[l];
      for (int64_t e = indptr[l]; e < indptr[l + 1]; ++e) {
        int64_t sub = find_line(cols[e]);
        if (sub < 0) {
          acc.emplace_back(cols[e], wts[e]);
        } else {
          b += wts[e] * resolved_inhom[sub];
          for (auto& [c2, w2] : resolved[sub]) {
            acc.emplace_back(c2, wts[e] * w2);
          }
        }
      }
      std::sort(acc.begin(), acc.end());
      std::vector<std::pair<int64_t, double>> merged;
      for (auto& [c, w] : acc) {
        if (!merged.empty() && merged.back().first == c) {
          merged.back().second += w;
        } else {
          merged.emplace_back(c, w);
        }
      }
      resolved[l] = std::move(merged);
      resolved_inhom[l] = b;
      done[l] = 1;
      stack.pop_back();
    }
  }

  int64_t nnz = 0;
  out_indptr[0] = 0;
  for (int64_t i = 0; i < n_lines; ++i) {
    if (nnz + (int64_t)resolved[i].size() > capacity) return -1;
    for (auto& [c, w] : resolved[i]) {
      out_cols[nnz] = c;
      out_wts[nnz] = w;
      nnz++;
    }
    out_indptr[i + 1] = nnz;
    out_inhom[i] = resolved_inhom[i];
  }
  return nnz;
}

// ---------------------------------------------------------------------
// Point location: Newton-invert the multilinear (Q1) map over candidate
// cells (candidates pre-sorted by center distance on the Python side is
// not needed — we scan all cells but early-exit on bbox).
//   verts:    n_v x dim, cells: n_c x 2^dim (int64, lexicographic)
//   points:   n_p x dim
//   out_cell: n_p (or -1), out_xi: n_p x dim
// ---------------------------------------------------------------------
void mk_locate_points_q1(const double* verts, int64_t n_v,
                         const int64_t* cells, int64_t n_c, int dim,
                         const double* points, int64_t n_p,
                         double tol, int64_t* out_cell, double* out_xi) {
  const int ncv = 1 << dim;
  for (int64_t p = 0; p < n_p; ++p) {
    out_cell[p] = -1;
    const double* pt = points + p * dim;
    for (int64_t c = 0; c < n_c; ++c) {
      // bbox test
      double lo[3], hi[3];
      for (int d = 0; d < dim; ++d) {
        lo[d] = 1e300;
        hi[d] = -1e300;
      }
      for (int v = 0; v < ncv; ++v) {
        const double* x = verts + cells[c * ncv + v] * dim;
        for (int d = 0; d < dim; ++d) {
          lo[d] = std::min(lo[d], x[d]);
          hi[d] = std::max(hi[d], x[d]);
        }
      }
      bool inside = true;
      for (int d = 0; d < dim; ++d) {
        double pad = 0.1 * (hi[d] - lo[d]) + tol;
        if (pt[d] < lo[d] - pad || pt[d] > hi[d] + pad) inside = false;
      }
      if (!inside) continue;

      // Newton on the multilinear map
      double xi[3] = {0.5, 0.5, 0.5};
      bool conv = false;
      for (int it = 0; it < 40; ++it) {
        double x[3] = {0, 0, 0};
        double J[9] = {0};
        for (int v = 0; v < ncv; ++v) {
          double s = 1.0, ds[3];
          for (int d = 0; d < dim; ++d) {
            double t = (v >> d) & 1 ? xi[d] : 1.0 - xi[d];
            s *= t;
          }
          for (int d = 0; d < dim; ++d) {
            double g = (v >> d) & 1 ? 1.0 : -1.0;
            double prod = g;
            for (int e = 0; e < dim; ++e) {
              if (e == d) continue;
              prod *= (v >> e) & 1 ? xi[e] : 1.0 - xi[e];
            }
            ds[d] = prod;
          }
          const double* xv = verts + cells[c * ncv + v] * dim;
          for (int a = 0; a < dim; ++a) {
            x[a] += s * xv[a];
            for (int d = 0; d < dim; ++d) J[a * dim + d] += ds[d] * xv[a];
          }
        }
        double r[3], nr = 0;
        for (int a = 0; a < dim; ++a) {
          r[a] = pt[a] - x[a];
          nr += r[a] * r[a];
        }
        if (std::sqrt(nr) < tol) {
          conv = true;
          break;
        }
        // solve J dxi = r (2x2 or 3x3)
        double dxi[3] = {0, 0, 0};
        if (dim == 2) {
          double det = J[0] * J[3] - J[1] * J[2];
          if (std::abs(det) < 1e-30) break;
          dxi[0] = (r[0] * J[3] - r[1] * J[1]) / det;
          dxi[1] = (J[0] * r[1] - J[2] * r[0]) / det;
        } else {
          double det = J[0] * (J[4] * J[8] - J[5] * J[7]) -
                       J[1] * (J[3] * J[8] - J[5] * J[6]) +
                       J[2] * (J[3] * J[7] - J[4] * J[6]);
          if (std::abs(det) < 1e-30) break;
          double inv[9];
          inv[0] = (J[4] * J[8] - J[5] * J[7]) / det;
          inv[1] = (J[2] * J[7] - J[1] * J[8]) / det;
          inv[2] = (J[1] * J[5] - J[2] * J[4]) / det;
          inv[3] = (J[5] * J[6] - J[3] * J[8]) / det;
          inv[4] = (J[0] * J[8] - J[2] * J[6]) / det;
          inv[5] = (J[2] * J[3] - J[0] * J[5]) / det;
          inv[6] = (J[3] * J[7] - J[4] * J[6]) / det;
          inv[7] = (J[1] * J[6] - J[0] * J[7]) / det;
          inv[8] = (J[0] * J[4] - J[1] * J[3]) / det;
          for (int a = 0; a < 3; ++a)
            for (int b = 0; b < 3; ++b) dxi[a] += inv[a * 3 + b] * r[b];
        }
        for (int d = 0; d < dim; ++d) {
          dxi[d] = std::max(-0.5, std::min(0.5, dxi[d]));
          xi[d] += dxi[d];
        }
      }
      if (conv) {
        bool in_ref = true;
        for (int d = 0; d < dim; ++d)
          if (xi[d] < -1e-6 || xi[d] > 1 + 1e-6) in_ref = false;
        if (in_ref) {
          out_cell[p] = c;
          for (int d = 0; d < dim; ++d)
            out_xi[p * dim + d] = std::max(0.0, std::min(1.0, xi[d]));
          break;
        }
      }
    }
  }
}

}  // extern "C"
