// Greedy min-fill pivot ordering for the block LDL^T symbolic analysis.
//
// Native equivalent of the reference's fill heuristic
// (src/epsilon/vector/block_cholesky.cc:11-64 with the nonzero cost model of
// linear_map.cc:141-164), operating on the block sparsity graph: given the
// block adjacency with per-block nnz costs, repeatedly eliminate the pivot
// whose Schur update creates the least predicted fill.
//
// Runs at compile/factor time on the host; exposed via ctypes with a
// pure-Python fallback (epsilon_tpu/ops/cholesky.py keeps its own).

#include <cstdint>
#include <vector>

extern "C" {

// n: number of block rows/cols.
// nnz: n*n row-major matrix of per-block nonzero costs (0 = structurally
//      empty block); symmetric structure assumed.
// dims: per-block dimension.
// order_out: the elimination order (permutation of 0..n-1).
void min_fill_order(int64_t n, const int64_t* nnz, const int64_t* dims,
                    int64_t* order_out) {
  std::vector<std::vector<int64_t>> cost(n, std::vector<int64_t>(n));
  for (int64_t i = 0; i < n; i++)
    for (int64_t j = 0; j < n; j++) cost[i][j] = nnz[i * n + j];
  std::vector<bool> done(n, false);

  for (int64_t step = 0; step < n; step++) {
    int64_t best = -1;
    int64_t best_fill = INT64_MAX;
    for (int64_t p = 0; p < n; p++) {
      if (done[p] || cost[p][p] == 0) continue;
      int64_t fill = 0;
      for (int64_t i = 0; i < n; i++) {
        if (done[i] || i == p || cost[i][p] == 0) continue;
        for (int64_t j = 0; j < n; j++) {
          if (done[j] || j == p || cost[p][j] == 0) continue;
          fill += cost[i][p] * cost[p][j] / (dims[p] > 0 ? dims[p] : 1);
        }
      }
      if (fill < best_fill) {
        best_fill = fill;
        best = p;
      }
    }
    if (best < 0) {
      // no pivot with a diagonal block: fall back to first remaining
      for (int64_t p = 0; p < n; p++)
        if (!done[p]) { best = p; break; }
    }
    order_out[step] = best;
    done[best] = true;

    // Schur fill update: A[i][j] gains |A[i][p]|*|A[p][j]|/dim(p)
    for (int64_t i = 0; i < n; i++) {
      if (done[i] || cost[i][best] == 0) continue;
      for (int64_t j = 0; j < n; j++) {
        if (done[j] || cost[best][j] == 0) continue;
        int64_t d = dims[best] > 0 ? dims[best] : 1;
        int64_t upd = cost[i][best] * cost[best][j] / d;
        int64_t cap = dims[i] * dims[j];
        int64_t val = cost[i][j] + upd;
        cost[i][j] = val > cap ? cap : val;
      }
    }
  }
}

}  // extern "C"
