// Native host-side graph preprocessing for ultra_torchdrug_tpu.
//
// The reference's native code is its CUDA rspmm kernel (device side — here
// replaced by Pallas). The framework's own native surface is the *host* hot
// path: CSR layout construction for the Pallas kernels and the relation-graph
// sparsity-pattern joins, which run once per graph but on multi-million-edge
// KGs dominate preprocessing time in pure numpy/scipy.
//
// Exposed via a C ABI (ctypes from Python; see native/__init__.py). All
// buffers are caller-allocated numpy arrays.
//
// Build: g++ -O3 -march=native -shared -fPIC graphlib.cpp -o libgraphlib.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <unordered_set>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// CSR layout build (mirrors ops/csr.py::build_layout)
//
// Sorts edges by row id (stable), aligns chunks of `tile_edges` edges to row
// tiles of `tile_rows` rows by inserting padding slots, emits the flat padded
// arrays the Pallas kernels consume.
//
// Returns the padded edge count E2 (<= capacity computed by
// csr_layout_capacity); chunk count = E2 / tile_edges.
// ---------------------------------------------------------------------------

int64_t csr_layout_capacity(int64_t num_edges, int64_t num_rows,
                            int64_t tile_rows, int64_t tile_edges) {
  int64_t tiles = std::max<int64_t>(1, (num_rows + tile_rows - 1) / tile_rows);
  return num_edges + tiles * tile_edges;  // worst-case alignment padding
}

int64_t csr_layout_build(
    const int32_t* row_ids, const int32_t* gather1, const int32_t* gather2,
    const int32_t* aux, int64_t num_edges, int64_t num_rows,
    int64_t tile_rows, int64_t tile_edges,
    // outputs (capacity from csr_layout_capacity; chunk_row sized
    // capacity/tile_edges)
    int32_t* out_gather1, int32_t* out_gather2, int32_t* out_aux,
    int32_t* out_row_local, int32_t* out_edge_id, float* out_valid,
    int32_t* out_chunk_row) {
  int64_t num_tiles =
      std::max<int64_t>(1, (num_rows + tile_rows - 1) / tile_rows);

  // stable sort by row id
  std::vector<int64_t> order(num_edges);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return row_ids[a] < row_ids[b]; });

  // per-tile counts and aligned starts
  std::vector<int64_t> counts(num_tiles, 0);
  for (int64_t e = 0; e < num_edges; ++e) counts[row_ids[e] / tile_rows]++;
  std::vector<int64_t> aligned(num_tiles), starts(num_tiles + 1, 0);
  // every row tile gets >= 1 chunk: the Pallas kernels only zero an output
  // tile when a chunk targeting it arrives, so an edge-free tile would
  // otherwise return uninitialized VMEM
  for (int64_t t = 0; t < num_tiles; ++t)
    aligned[t] = std::max<int64_t>(
        tile_edges, ((counts[t] + tile_edges - 1) / tile_edges) * tile_edges);
  for (int64_t t = 0; t < num_tiles; ++t) starts[t + 1] = starts[t] + aligned[t];
  int64_t E2 = starts[num_tiles];

  // initialize padding
  std::fill(out_gather1, out_gather1 + E2, 0);
  std::fill(out_gather2, out_gather2 + E2, 0);
  std::fill(out_aux, out_aux + E2, 0);
  std::fill(out_row_local, out_row_local + E2, 0);
  std::fill(out_edge_id, out_edge_id + E2, 0);
  std::fill(out_valid, out_valid + E2, 0.0f);

  std::vector<int64_t> cursor(starts.begin(), starts.end() - 1);
  for (int64_t k = 0; k < num_edges; ++k) {
    int64_t e = order[k];
    int64_t t = row_ids[e] / tile_rows;
    int64_t p = cursor[t]++;
    out_gather1[p] = gather1[e];
    out_gather2[p] = gather2 ? gather2[e] : 0;
    out_aux[p] = aux[e];
    out_row_local[p] = row_ids[e] - (int32_t)(t * tile_rows);
    out_edge_id[p] = (int32_t)e;
    out_valid[p] = 1.0f;
  }

  int64_t num_chunks = E2 / tile_edges;
  for (int64_t c = 0, t = 0; c < num_chunks; ++c) {
    while (t + 1 < num_tiles && c * tile_edges >= starts[t + 1]) ++t;
    out_chunk_row[c] = (int32_t)t;
  }
  return E2;
}

// ---------------------------------------------------------------------------
// Relation-graph sparsity-pattern products (mirrors data/relgraph.py):
// given unique (entity, relation) incidence pairs for heads (Eh) and tails
// (Et), emit the nonzero patterns of Eh^T Eh, Et^T Et, Eh^T Et, Et^T Eh as
// (r1, r2, etype) triples with etypes 0..3.
//
// Two-phase: call with out=nullptr to count, then with the buffer.
// ---------------------------------------------------------------------------

static int64_t pattern_join(const std::vector<std::vector<int32_t>>& a,
                            const std::vector<std::vector<int32_t>>& b,
                            int64_t num_rel, int32_t etype, int32_t* out,
                            int64_t offset) {
  // a[v], b[v]: relation lists per entity; emit unique (r1 in a[v], r2 in b[v])
  std::vector<std::unordered_set<int64_t>> seen;  // per r1 bucket
  seen.resize(num_rel);
  int64_t count = 0;
  size_t V = a.size();
  for (size_t v = 0; v < V; ++v) {
    for (int32_t r1 : a[v]) {
      auto& s = seen[r1];
      for (int32_t r2 : b[v]) {
        if (s.insert(r2).second) {
          if (out) {
            out[(offset + count) * 3 + 0] = r1;
            out[(offset + count) * 3 + 1] = r2;
            out[(offset + count) * 3 + 2] = etype;
          }
          ++count;
        }
      }
    }
  }
  return count;
}

int64_t relation_graph_patterns(
    const int32_t* heads, const int32_t* tails, const int32_t* rels,
    int64_t num_edges, int64_t num_nodes, int64_t num_rels,
    int32_t* out /* [cap, 3] or nullptr to count */) {
  // build unique incidence lists per entity
  std::vector<std::unordered_set<int32_t>> hset(num_nodes), tset(num_nodes);
  for (int64_t e = 0; e < num_edges; ++e) {
    hset[heads[e]].insert(rels[e]);
    tset[tails[e]].insert(rels[e]);
  }
  std::vector<std::vector<int32_t>> hl(num_nodes), tl(num_nodes);
  for (int64_t v = 0; v < num_nodes; ++v) {
    hl[v].assign(hset[v].begin(), hset[v].end());
    tl[v].assign(tset[v].begin(), tset[v].end());
  }
  int64_t n = 0;
  n += pattern_join(hl, hl, num_rels, 0, out, n);  // hh
  n += pattern_join(tl, tl, num_rels, 1, out, n);  // tt
  n += pattern_join(hl, tl, num_rels, 2, out, n);  // ht
  n += pattern_join(tl, hl, num_rels, 3, out, n);  // th
  return n;
}

// ---------------------------------------------------------------------------
// Degree-balanced LPT block assignment (mirrors parallel/balance.py::
// degree_balanced_permutation): nodes in decreasing-degree order (stable)
// each go to the lightest block with a free slot (capacity v_block).
// Deterministically identical to the Python fallback: ties on load resolve
// to the smallest block id, like heapq's (load, block) tuple order.
// ---------------------------------------------------------------------------

void degree_balanced_lpt(const int64_t* deg, int64_t num_nodes,
                         int64_t n_blocks, int64_t v_block, int32_t* to_new) {
  std::vector<int64_t> order(num_nodes);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return deg[a] > deg[b]; });

  using Entry = std::pair<int64_t, int64_t>;  // (load, block)
  std::vector<Entry> heap(n_blocks);
  for (int64_t s = 0; s < n_blocks; ++s) heap[s] = {0, s};
  auto gt = [](const Entry& a, const Entry& b) { return a > b; };  // min-heap
  std::make_heap(heap.begin(), heap.end(), gt);
  std::vector<int64_t> counts(n_blocks, 0);

  for (int64_t k = 0; k < num_nodes; ++k) {
    int64_t node = order[k];
    std::pop_heap(heap.begin(), heap.end(), gt);
    Entry top = heap.back();
    heap.pop_back();
    int64_t s = top.second;
    to_new[node] = (int32_t)(s * v_block + counts[s]);
    counts[s]++;
    if (counts[s] < v_block) {
      heap.push_back({top.first + deg[node], s});
      std::push_heap(heap.begin(), heap.end(), gt);
    }
  }
}

}  // extern "C"
