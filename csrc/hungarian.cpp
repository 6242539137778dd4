// Native host-side linear assignment solver (Jonker-Volgenant style shortest
// augmenting path, the same algorithm family as scipy's rectangular LSAP).
//
// Replaces the reference's scipy.optimize.linear_sum_assignment call site
// (ref: mmdet3d_plugin/core/bbox/assigners/hungarian_assigner_3d.py:137) with
// a dependency-free C++ implementation invoked from JAX host callbacks via
// ctypes (see mv2d_tpu/core/matching.py).
//
// Build: make -C csrc   (produces csrc/build/libmv2d_host.so)

#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// Finds an augmenting path starting at free row `cur_row` for an nr x nc
// cost matrix (nr <= nc). Returns the sink column, fills `path` with the
// predecessor column for each column on the shortest path tree.
int augmenting_path(int nc, const double* cost, std::vector<double>& u,
                    std::vector<double>& v, std::vector<int>& path,
                    std::vector<int>& row4col,
                    std::vector<double>& shortest_path_costs, int cur_row,
                    std::vector<bool>& sr, std::vector<bool>& sc,
                    std::vector<int>& remaining, double* p_min_val) {
  double min_val = 0;
  int num_remaining = nc;
  for (int it = 0; it < nc; ++it) {
    remaining[it] = nc - it - 1;
  }
  std::fill(sr.begin(), sr.end(), false);
  std::fill(sc.begin(), sc.end(), false);
  std::fill(shortest_path_costs.begin(), shortest_path_costs.end(), kInf);

  int sink = -1;
  int i = cur_row;
  while (sink == -1) {
    int index = -1;
    double lowest = kInf;
    sr[i] = true;
    for (int it = 0; it < num_remaining; ++it) {
      int j = remaining[it];
      double r = min_val + cost[i * nc + j] - u[i] - v[j];
      if (r < shortest_path_costs[j]) {
        path[j] = i;
        shortest_path_costs[j] = r;
      }
      if (shortest_path_costs[j] < lowest ||
          (shortest_path_costs[j] == lowest && row4col[j] == -1)) {
        lowest = shortest_path_costs[j];
        index = it;
      }
    }
    min_val = lowest;
    if (min_val == kInf) return -1;  // infeasible
    int j = remaining[index];
    if (row4col[j] == -1) {
      sink = j;
    } else {
      i = row4col[j];
    }
    sc[j] = true;
    remaining[index] = remaining[--num_remaining];
  }
  *p_min_val = min_val;
  return sink;
}

// Solves min-cost assignment for an nr x nc matrix with nr <= nc.
// col4row[i] = assigned column of row i.
int solve_rect(int nr, int nc, const double* cost, std::vector<int>& col4row) {
  std::vector<double> u(nr, 0), v(nc, 0), shortest_path_costs(nc);
  std::vector<int> path(nc, -1), row4col(nc, -1);
  std::vector<bool> sr(nr), sc(nc);
  std::vector<int> remaining(nc);
  col4row.assign(nr, -1);

  for (int cur_row = 0; cur_row < nr; ++cur_row) {
    double min_val;
    int sink = augmenting_path(nc, cost, u, v, path, row4col,
                               shortest_path_costs, cur_row, sr, sc, remaining,
                               &min_val);
    if (sink < 0) return -1;
    u[cur_row] += min_val;
    for (int i = 0; i < nr; ++i) {
      if (sr[i] && i != cur_row) {
        u[i] += min_val - shortest_path_costs[col4row[i]];
      }
    }
    for (int j = 0; j < nc; ++j) {
      if (sc[j]) v[j] -= min_val - shortest_path_costs[j];
    }
    int j = sink;
    while (true) {
      int i = path[j];
      row4col[j] = i;
      int tmp = col4row[i];
      col4row[i] = j;
      if (i == cur_row) break;
      j = tmp;
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// cost: row-major [q, g]. out: [q], out[row] = assigned column or -1.
// Assigns min(q, g) pairs. Returns 0 on success.
int lap_solve(int q, int g, const double* cost, int* out) {
  for (int i = 0; i < q; ++i) out[i] = -1;
  if (q <= 0 || g <= 0) return 0;
  std::vector<int> col4row;
  if (q >= g) {
    // transpose: rows = g (the smaller side)
    std::vector<double> t(static_cast<size_t>(g) * q);
    for (int i = 0; i < q; ++i)
      for (int j = 0; j < g; ++j) t[static_cast<size_t>(j) * q + i] = cost[static_cast<size_t>(i) * g + j];
    if (solve_rect(g, q, t.data(), col4row) != 0) return -1;
    for (int j = 0; j < g; ++j) {
      if (col4row[j] >= 0) out[col4row[j]] = j;
    }
  } else {
    if (solve_rect(q, g, cost, col4row) != 0) return -1;
    for (int i = 0; i < q; ++i) out[i] = col4row[i];
  }
  return 0;
}
}
