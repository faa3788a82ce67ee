// Native batch packer — the host-side collation hot loop.
//
// The reference runs graph collation inside torch DataLoader workers whose
// copy loops bottom out in torch's C++ (SURVEY.md §1). This is the
// equivalent native component for our static-shape packing: given a
// dataset stored as flat concatenated arrays with offsets (the npz shard
// layout of data/datasets.py), pack a batch of graph indices into padded
// buffers with cumulative index offsetting — one tight memcpy/loop pass,
// dtype-agnostic (features are copied as raw bytes).
//
// Exposed as C symbols for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC packer.cpp -o libpacker.so

#include <cstdint>
#include <cstring>

extern "C" {

// Returns 0 on success, -1 on buffer overflow.
//
// Dataset-level inputs (flat, graph i occupies [node_off[i], node_off[i+1])):
//   node_feat_bytes : sumN * fn_bytes
//   edge_recv/edge_send : per-edge endpoint indices (graph-local, int32)
//   edge_feat_bytes : sumE * fe_bytes
// Batch selection: graph_ids[n_graphs]
// Outputs are caller-allocated and ZEROED by this function.
int pack_batch(
    const uint8_t* node_feat_bytes, const int64_t* node_off,
    const int32_t* edge_recv, const int32_t* edge_send,
    const uint8_t* edge_feat_bytes, const int64_t* edge_off,
    const int64_t* graph_ids, int64_t n_graphs,
    int64_t fn_bytes, int64_t fe_bytes,
    int64_t max_nodes, int64_t max_edges, int64_t max_graphs,
    uint8_t* out_node_feat, uint8_t* out_edge_feat,
    int32_t* out_send, int32_t* out_recv,
    int32_t* out_node_graph, uint8_t* out_node_mask,
    uint8_t* out_edge_mask, uint8_t* out_graph_mask) {
  if (n_graphs > max_graphs) return -1;

  std::memset(out_node_feat, 0, (size_t)(max_nodes * fn_bytes));
  std::memset(out_edge_feat, 0, (size_t)(max_edges * fe_bytes));
  std::memset(out_send, 0, (size_t)max_edges * sizeof(int32_t));
  std::memset(out_recv, 0, (size_t)max_edges * sizeof(int32_t));
  std::memset(out_node_graph, 0, (size_t)max_nodes * sizeof(int32_t));
  std::memset(out_node_mask, 0, (size_t)max_nodes);
  std::memset(out_edge_mask, 0, (size_t)max_edges);
  std::memset(out_graph_mask, 0, (size_t)max_graphs);

  int64_t n_cursor = 0, e_cursor = 0;
  for (int64_t g = 0; g < n_graphs; ++g) {
    const int64_t gi = graph_ids[g];
    const int64_t n0 = node_off[gi], n1 = node_off[gi + 1];
    const int64_t e0 = edge_off[gi], e1 = edge_off[gi + 1];
    const int64_t nn = n1 - n0, ne = e1 - e0;
    if (n_cursor + nn > max_nodes || e_cursor + ne > max_edges) return -1;

    std::memcpy(out_node_feat + n_cursor * fn_bytes,
                node_feat_bytes + n0 * fn_bytes, (size_t)(nn * fn_bytes));
    std::memcpy(out_edge_feat + e_cursor * fe_bytes,
                edge_feat_bytes + e0 * fe_bytes, (size_t)(ne * fe_bytes));

    const int32_t off = (int32_t)n_cursor;
    for (int64_t e = 0; e < ne; ++e) {
      out_recv[e_cursor + e] = edge_recv[e0 + e] + off;
      out_send[e_cursor + e] = edge_send[e0 + e] + off;
    }
    for (int64_t n = 0; n < nn; ++n) {
      out_node_graph[n_cursor + n] = (int32_t)g;
      out_node_mask[n_cursor + n] = 1;
    }
    std::memset(out_edge_mask + e_cursor, 1, (size_t)ne);
    out_graph_mask[g] = 1;

    n_cursor += nn;
    e_cursor += ne;
  }
  return 0;
}

// Block-diagonal variant: graph g is placed in node/edge block block_of[g]
// (first-fit computed by the python wrapper); rows are filled contiguously
// inside each block.
int pack_batch_blocked(
    const uint8_t* node_feat_bytes, const int64_t* node_off,
    const int32_t* edge_recv, const int32_t* edge_send,
    const uint8_t* edge_feat_bytes, const int64_t* edge_off,
    const int64_t* graph_ids, const int64_t* block_of, int64_t n_graphs,
    int64_t fn_bytes, int64_t fe_bytes,
    int64_t n_blocks, int64_t block_nodes, int64_t block_edges,
    int64_t max_graphs,
    uint8_t* out_node_feat, uint8_t* out_edge_feat,
    int32_t* out_send, int32_t* out_recv,
    int32_t* out_node_graph, uint8_t* out_node_mask,
    uint8_t* out_edge_mask, uint8_t* out_graph_mask,
    int64_t* block_fill_n, int64_t* block_fill_e) {
  const int64_t max_nodes = n_blocks * block_nodes;
  const int64_t max_edges = n_blocks * block_edges;
  if (n_graphs > max_graphs) return -1;

  std::memset(out_node_feat, 0, (size_t)(max_nodes * fn_bytes));
  std::memset(out_edge_feat, 0, (size_t)(max_edges * fe_bytes));
  std::memset(out_send, 0, (size_t)max_edges * sizeof(int32_t));
  std::memset(out_recv, 0, (size_t)max_edges * sizeof(int32_t));
  std::memset(out_node_graph, 0, (size_t)max_nodes * sizeof(int32_t));
  std::memset(out_node_mask, 0, (size_t)max_nodes);
  std::memset(out_edge_mask, 0, (size_t)max_edges);
  std::memset(out_graph_mask, 0, (size_t)max_graphs);
  std::memset(block_fill_n, 0, (size_t)n_blocks * sizeof(int64_t));
  std::memset(block_fill_e, 0, (size_t)n_blocks * sizeof(int64_t));

  for (int64_t g = 0; g < n_graphs; ++g) {
    const int64_t gi = graph_ids[g];
    const int64_t b = block_of[g];
    if (b < 0 || b >= n_blocks) return -1;
    const int64_t n0 = node_off[gi], nn = node_off[gi + 1] - n0;
    const int64_t e0 = edge_off[gi], ne = edge_off[gi + 1] - e0;
    if (block_fill_n[b] + nn > block_nodes ||
        block_fill_e[b] + ne > block_edges)
      return -1;
    const int64_t n_cursor = b * block_nodes + block_fill_n[b];
    const int64_t e_cursor = b * block_edges + block_fill_e[b];

    std::memcpy(out_node_feat + n_cursor * fn_bytes,
                node_feat_bytes + n0 * fn_bytes, (size_t)(nn * fn_bytes));
    std::memcpy(out_edge_feat + e_cursor * fe_bytes,
                edge_feat_bytes + e0 * fe_bytes, (size_t)(ne * fe_bytes));
    const int32_t off = (int32_t)n_cursor;
    for (int64_t e = 0; e < ne; ++e) {
      out_recv[e_cursor + e] = edge_recv[e0 + e] + off;
      out_send[e_cursor + e] = edge_send[e0 + e] + off;
    }
    for (int64_t n = 0; n < nn; ++n) {
      out_node_graph[n_cursor + n] = (int32_t)g;
      out_node_mask[n_cursor + n] = 1;
    }
    std::memset(out_edge_mask + e_cursor, 1, (size_t)ne);
    out_graph_mask[g] = 1;
    block_fill_n[b] += nn;
    block_fill_e[b] += ne;
  }
  return 0;
}

// Epoch planner: walk the (shuffled) graph order once, assigning graphs to
// batches and block-diagonal slots with the same greedy first-fit the
// python loaders use (flush when the next graph fits no block, or when
// batch_size graphs are placed). Standard contiguous layout = 1 block of
// (max_nodes, max_edges). Emits, per ordered graph: its batch index and
// its node/edge slot offsets. Returns the number of batches.
int64_t plan_epoch(
    const int64_t* lens_n, const int64_t* lens_e,
    const int64_t* order, int64_t n,
    int64_t batch_size, int64_t n_blocks, int64_t block_nodes,
    int64_t block_edges,
    int32_t* out_batch, int32_t* out_nstart, int32_t* out_estart) {
  // fill state per block (heap-free: n_blocks is small)
  int64_t fill_n[1024];
  int64_t fill_e[1024];
  if (n_blocks > 1024) return -1;
  for (int64_t b = 0; b < n_blocks; ++b) fill_n[b] = fill_e[b] = 0;

  int64_t batch = 0, in_batch = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t g = order[i];
    const int64_t nn = lens_n[g], ne = lens_e[g];
    int64_t placed = -1;
    for (int64_t b = 0; b < n_blocks; ++b) {
      if (fill_n[b] + nn <= block_nodes && fill_e[b] + ne <= block_edges) {
        placed = b;
        break;
      }
    }
    if (placed < 0) {  // flush: start a new batch
      if (in_batch == 0) return -1;  // single graph exceeds capacity
      ++batch;
      in_batch = 0;
      for (int64_t b = 0; b < n_blocks; ++b) fill_n[b] = fill_e[b] = 0;
      placed = 0;
      if (nn > block_nodes || ne > block_edges) return -1;
    }
    out_batch[i] = (int32_t)batch;
    out_nstart[i] = (int32_t)(placed * block_nodes + fill_n[placed]);
    out_estart[i] = (int32_t)(placed * block_edges + fill_e[placed]);
    fill_n[placed] += nn;
    fill_e[placed] += ne;
    if (++in_batch == batch_size) {
      ++batch;
      in_batch = 0;
      for (int64_t b = 0; b < n_blocks; ++b) fill_n[b] = fill_e[b] = 0;
    }
  }
  return in_batch ? batch + 1 : batch;
}

// NegativeEdge rejection sampling (chem/util.py:22-52) for one batch —
// the descriptor pipeline's host hot spot for edgepred (the vectorized
// numpy sampler measured 2.5 ms/batch and gated e2e at 4.6 M edges/s;
// this loop is the same semantics in ~100 us). Per graph: draw up to
// 5*E uniform (a, b) pairs, keep the first E/2 that are not self-loops,
// not existing directed edges, and not duplicates; emit batch-slot
// pairs. Returns the number of accepted pairs, or -1 on budget overflow.
//
// RNG: splitmix64 seeded per (batch_seed, graph) — order-independent,
// same stream regardless of which process assembles the batch.
static inline uint64_t splitmix64(uint64_t* s) {
  uint64_t z = (*s += 0x9e3779b97f4a7c15ull);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
  return z ^ (z >> 31);
}

int64_t sample_negatives(
    const int32_t* send, const int32_t* recv, const int64_t* edge_off,
    const int64_t* graph_ids, int64_t n_graphs,
    const int64_t* lens_n, const int64_t* nstarts,
    uint64_t seed, int64_t budget,
    int32_t* out_pairs, uint8_t* out_mask) {
  int64_t out = 0;
  // open-addressing set over int64 keys (a*n + b); rebuilt per graph
  int64_t cap = 0;
  int64_t* table = nullptr;
  for (int64_t i = 0; i < n_graphs; ++i) {
    const int64_t gid = graph_ids[i];
    const int64_t e0 = edge_off[gid], e1 = edge_off[gid + 1];
    const int64_t e = e1 - e0;
    const int64_t n = lens_n[i];
    const int64_t want = e / 2;
    if (want <= 0 || n <= 1) continue;
    // table sized for existing edges + accepted pairs, power of two
    int64_t need = 2 * (e + want) + 8;
    int64_t c = 16;
    while (c < need) c <<= 1;
    if (c > cap) {
      delete[] table;
      table = new int64_t[c];
      cap = c;
    }
    for (int64_t t = 0; t < c; ++t) table[t] = -1;
    const uint64_t mask = (uint64_t)(c - 1);
    auto insert = [&](int64_t key) -> bool {  // false if already present
      uint64_t h = (uint64_t)key * 0x9e3779b97f4a7c15ull;
      uint64_t p = (h ^ (h >> 29)) & mask;
      while (table[p] != -1) {
        if (table[p] == key) return false;
        p = (p + 1) & mask;
      }
      table[p] = key;
      return true;
    };
    for (int64_t k = e0; k < e1; ++k)
      insert((int64_t)send[k] * n + recv[k]);
    uint64_t st = seed ^ (0xd1342543de82ef95ull * (uint64_t)(gid + 1));
    int64_t got = 0;
    const int64_t base = nstarts[i];
    for (int64_t d = 0; d < 5 * e && got < want; ++d) {
      const uint64_t r = splitmix64(&st);
      const int64_t a = (int64_t)((r >> 32) % (uint64_t)n);
      const int64_t b = (int64_t)((r & 0xffffffffull) % (uint64_t)n);
      if (a == b) continue;
      if (!insert(a * n + b)) continue;  // existing edge or duplicate
      if (out >= budget) {
        delete[] table;
        return -1;
      }
      out_pairs[2 * out] = (int32_t)(base + a);
      out_pairs[2 * out + 1] = (int32_t)(base + b);
      out_mask[out] = 1;
      ++out;
      ++got;
    }
  }
  delete[] table;
  return out;
}

// Block-aligned variant: negatives land in per-BLOCK regions of
// block_edges/2 slots each (graph i's block = estarts[i] / block_edges),
// so the scoring head can run as a one-hot Pallas kernel (the compacted
// [K, 2] layout has no block structure). Per-block totals can never
// exceed block_edges/2 (sum of e_g/2 over a block's graphs <= E_block/2).
// out_pairs: [n_blocks * half * 2], out_mask: [n_blocks * half], both
// caller-zeroed. Returns accepted count or -1 on (impossible) overflow.
int64_t sample_negatives_blocked(
    const int32_t* send, const int32_t* recv, const int64_t* edge_off,
    const int64_t* graph_ids, int64_t n_graphs,
    const int64_t* lens_n, const int64_t* nstarts, const int64_t* estarts,
    int64_t block_edges, int64_t n_blocks,
    uint64_t seed,
    int32_t* out_pairs, uint8_t* out_mask) {
  const int64_t half = block_edges / 2;
  int64_t* cursor = new int64_t[n_blocks]();
  int64_t cap = 0;
  int64_t* table = nullptr;
  int64_t total = 0;
  for (int64_t i = 0; i < n_graphs; ++i) {
    const int64_t gid = graph_ids[i];
    const int64_t e0 = edge_off[gid], e1 = edge_off[gid + 1];
    const int64_t e = e1 - e0;
    const int64_t n = lens_n[i];
    const int64_t want = e / 2;
    if (want <= 0 || n <= 1) continue;
    const int64_t bk = estarts[i] / block_edges;
    if (bk < 0 || bk >= n_blocks) { delete[] cursor; delete[] table; return -1; }
    int64_t need = 2 * (e + want) + 8;
    int64_t c = 16;
    while (c < need) c <<= 1;
    if (c > cap) {
      delete[] table;
      table = new int64_t[c];
      cap = c;
    }
    for (int64_t t = 0; t < c; ++t) table[t] = -1;
    const uint64_t hmask = (uint64_t)(c - 1);
    auto insert = [&](int64_t key) -> bool {
      uint64_t h = (uint64_t)key * 0x9e3779b97f4a7c15ull;
      uint64_t p = (h ^ (h >> 29)) & hmask;
      while (table[p] != -1) {
        if (table[p] == key) return false;
        p = (p + 1) & hmask;
      }
      table[p] = key;
      return true;
    };
    for (int64_t k = e0; k < e1; ++k)
      insert((int64_t)send[k] * n + recv[k]);
    uint64_t st = seed ^ (0xd1342543de82ef95ull * (uint64_t)(gid + 1));
    int64_t got = 0;
    const int64_t base = nstarts[i];
    for (int64_t d = 0; d < 5 * e && got < want; ++d) {
      const uint64_t r = splitmix64(&st);
      const int64_t a = (int64_t)((r >> 32) % (uint64_t)n);
      const int64_t b = (int64_t)((r & 0xffffffffull) % (uint64_t)n);
      if (a == b) continue;
      if (!insert(a * n + b)) continue;
      const int64_t slot = bk * half + cursor[bk];
      if (cursor[bk] >= half) { delete[] cursor; delete[] table; return -1; }
      out_pairs[2 * slot] = (int32_t)(base + a);
      out_pairs[2 * slot + 1] = (int32_t)(base + b);
      out_mask[slot] = 1;
      ++cursor[bk];
      ++got;
      ++total;
    }
  }
  delete[] cursor;
  delete[] table;
  return total;
}

}  // extern "C"
