// Native 4-node graphlet orbit counter (clean-room).
//
// Role: the one native component of the reference stack (SURVEY.md §2.1 #10
// — the GraphRNN MMD-orbit metric shells out to the ORCA C++ tool). This is
// a from-scratch implementation, not a copy: connected induced subgraphs of
// size 3 and 4 are enumerated exactly once with Wernicke's ESU algorithm and
// classified into the 15 standard graphlet orbits (Přulj numbering, orbits
// 0–14) by (edge count, within-subgraph degree), which identifies the orbit
// uniquely for every graphlet up to size 4:
//
//   G0 edge:          orbit 0 = degree
//   G1 path P3:       orbit 1 (end), orbit 2 (middle)
//   G2 triangle:      orbit 3
//   G3 path P4:       orbit 4 (end), orbit 5 (middle)
//   G4 star K1,3:     orbit 6 (leaf), orbit 7 (center)
//   G5 cycle C4:      orbit 8
//   G6 paw:           orbit 9 (tail), orbit 10 (triangle rim), orbit 11 (hub)
//   G7 diamond K4−e:  orbit 12 (deg-2), orbit 13 (deg-3)
//   G8 clique K4:     orbit 14
//
// Exposed as a C ABI for the Python ctypes binding (gnfx/eval/orbit.py).
// Complexity: O(#connected 4-subgraphs) — for the sparse graphs this
// framework evaluates (deg ~ constant) that is O(n · d³), far below the
// naive O(n⁴).

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct Graph {
  int n;
  std::vector<std::vector<int>> adj;     // sorted neighbor lists
  std::vector<uint64_t> bits;            // adjacency bitmap, row-major, n*words
  int words;

  bool connected(int u, int v) const {
    return (bits[(size_t)u * words + (v >> 6)] >> (v & 63)) & 1ULL;
  }
};

inline void classify3(const Graph& g, const int* s, int64_t* out) {
  // s: 3 distinct vertices forming a connected induced subgraph.
  int d[3] = {0, 0, 0};
  int edges = 0;
  for (int i = 0; i < 3; ++i)
    for (int j = i + 1; j < 3; ++j)
      if (g.connected(s[i], s[j])) { ++edges; ++d[i]; ++d[j]; }
  if (edges == 3) {                       // triangle
    for (int i = 0; i < 3; ++i) out[(size_t)s[i] * 15 + 3] += 1;
  } else {                                // path: middle has degree 2
    for (int i = 0; i < 3; ++i) out[(size_t)s[i] * 15 + (d[i] == 2 ? 2 : 1)] += 1;
  }
}

inline void classify4(const Graph& g, const int* s, int64_t* out) {
  int d[4] = {0, 0, 0, 0};
  int edges = 0;
  for (int i = 0; i < 4; ++i)
    for (int j = i + 1; j < 4; ++j)
      if (g.connected(s[i], s[j])) { ++edges; ++d[i]; ++d[j]; }
  switch (edges) {
    case 3: {
      // P4 (degrees 1,1,2,2) or star K1,3 (degrees 1,1,1,3)
      bool star = (d[0] == 3 || d[1] == 3 || d[2] == 3 || d[3] == 3);
      for (int i = 0; i < 4; ++i) {
        int orb = star ? (d[i] == 3 ? 7 : 6) : (d[i] == 2 ? 5 : 4);
        out[(size_t)s[i] * 15 + orb] += 1;
      }
      break;
    }
    case 4: {
      // C4 (2,2,2,2) or paw (1,2,2,3)
      bool cycle = (d[0] == 2 && d[1] == 2 && d[2] == 2 && d[3] == 2);
      for (int i = 0; i < 4; ++i) {
        int orb = cycle ? 8 : (d[i] == 1 ? 9 : (d[i] == 2 ? 10 : 11));
        out[(size_t)s[i] * 15 + orb] += 1;
      }
      break;
    }
    case 5:
      for (int i = 0; i < 4; ++i)
        out[(size_t)s[i] * 15 + (d[i] == 3 ? 13 : 12)] += 1;
      break;
    case 6:
      for (int i = 0; i < 4; ++i) out[(size_t)s[i] * 15 + 14] += 1;
      break;
    default:
      break;  // unreachable: ESU only yields connected subgraphs
  }
}

// Wernicke's ESU: every connected induced k-subgraph enumerated exactly once.
// sub: current subgraph (size depth); ext: extension candidates (> root, not
// already neighbors-of-sub except through the new vertex).
void esu_extend(const Graph& g, int root, std::vector<int>& sub,
                std::vector<int>& ext, std::vector<char>& in_nbr,
                int k, int64_t* out) {
  if ((int)sub.size() == k) {
    if (k == 3) classify3(g, sub.data(), out);
    else classify4(g, sub.data(), out);
    return;
  }
  // iterate over a snapshot of ext; remove-one-then-extend
  std::vector<int> ext_copy = ext;
  while (!ext_copy.empty()) {
    int w = ext_copy.back();
    ext_copy.pop_back();
    sub.push_back(w);
    if ((int)sub.size() == k) {
      if (k == 3) classify3(g, sub.data(), out);
      else classify4(g, sub.data(), out);
    } else {
      // new extension: ext_copy ∪ {u ∈ N(w): u > root, u ∉ sub, u not an
      // exclusive-neighborhood member already}
      std::vector<int> next_ext = ext_copy;
      std::vector<int> added;
      for (int u : g.adj[w]) {
        if (u <= root || in_nbr[u]) continue;
        bool in_sub = false;
        for (int v : sub) if (v == u) { in_sub = true; break; }
        if (!in_sub) {
          next_ext.push_back(u);
          in_nbr[u] = 1;
          added.push_back(u);
        }
      }
      esu_extend(g, root, sub, next_ext, in_nbr, k, out);
      for (int u : added) in_nbr[u] = 0;
    }
    sub.pop_back();
  }
}

void esu(const Graph& g, int k, int64_t* out) {
  std::vector<int> sub, ext;
  std::vector<char> in_nbr(g.n, 0);
  for (int v = 0; v < g.n; ++v) {
    sub.clear();
    ext.clear();
    sub.push_back(v);
    for (int u : g.adj[v])
      if (u > v) { ext.push_back(u); in_nbr[u] = 1; }
    esu_extend(g, v, sub, ext, in_nbr, k, out);
    for (int u : g.adj[v]) in_nbr[u] = 0;
  }
}

}  // namespace

extern "C" {

// edges: m pairs (u, v), 0-based, undirected, no duplicates/self-loops
// out:   n*15 int64, zeroed by caller or here; row i = orbit counts of node i
int orbit_counts_4(int n, int m, const int32_t* edges_u,
                   const int32_t* edges_v, int64_t* out) {
  if (n < 0 || m < 0) return -1;
  Graph g;
  g.n = n;
  g.words = (n + 63) / 64;
  g.adj.assign(n, {});
  g.bits.assign((size_t)n * g.words, 0);
  for (int e = 0; e < m; ++e) {
    int u = edges_u[e], v = edges_v[e];
    if (u < 0 || u >= n || v < 0 || v >= n || u == v) return -2;
    if (g.connected(u, v)) continue;  // ignore duplicate edges
    g.adj[u].push_back(v);
    g.adj[v].push_back(u);
    g.bits[(size_t)u * g.words + (v >> 6)] |= 1ULL << (v & 63);
    g.bits[(size_t)v * g.words + (u >> 6)] |= 1ULL << (u & 63);
  }
  for (auto& a : g.adj) std::sort(a.begin(), a.end());
  std::fill(out, out + (size_t)n * 15, 0);
  // orbit 0: degree
  for (int v = 0; v < n; ++v) out[(size_t)v * 15 + 0] = (int64_t)g.adj[v].size();
  esu(g, 3, out);
  esu(g, 4, out);
  return 0;
}

}  // extern "C"
