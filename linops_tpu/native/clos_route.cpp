// Radix-128 Clos routing — native port of sparse/routing.py.
//
// The route computation (recursive Euler-split edge coloring of 128-regular
// bipartite multigraphs) is pure pointer chasing: ~45 s in numpy at the
// 2^21-element domain, <1 s here. The layout contract is IDENTICAL to the
// Python router (routing.py::clos_apply is the oracle for both); tests
// assert elementwise equality of the emitted stage arrays.
//
// Built with g++ by linops_tpu/native/__init__.py on first use.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int64_t RADIX = 128;

// Split a deg-regular bipartite multigraph into two (deg/2)-regular halves
// by alternately 2-coloring Euler circuits. Mirrors routing.py::_euler_split.
struct EulerScratch {
  std::vector<int64_t> order_s, order_d, ptr_s, ptr_d, cnt;
  std::vector<uint8_t> visited;
};

void euler_split(const int64_t* src, const int64_t* dst,
                 const int64_t* edge_ids, int64_t n_edges, int64_t deg,
                 uint8_t* side, EulerScratch& S) {
  if (n_edges == 0) return;
  int64_t n_src = 0, n_dst = 0;
  for (int64_t i = 0; i < n_edges; i++) {
    int64_t e = edge_ids[i];
    if (src[e] + 1 > n_src) n_src = src[e] + 1;
    if (dst[e] + 1 > n_dst) n_dst = dst[e] + 1;
  }
  // counting sorts (stable) of local edge indices by src and by dst
  S.order_s.resize(n_edges);
  S.order_d.resize(n_edges);
  S.cnt.assign(std::max(n_src, n_dst) + 1, 0);
  for (int64_t i = 0; i < n_edges; i++) S.cnt[src[edge_ids[i]] + 1]++;
  for (int64_t u = 0; u < n_src; u++) S.cnt[u + 1] += S.cnt[u];
  for (int64_t i = 0; i < n_edges; i++) S.order_s[S.cnt[src[edge_ids[i]]]++] = i;
  S.cnt.assign(std::max(n_src, n_dst) + 1, 0);
  for (int64_t i = 0; i < n_edges; i++) S.cnt[dst[edge_ids[i]] + 1]++;
  for (int64_t v = 0; v < n_dst; v++) S.cnt[v + 1] += S.cnt[v];
  for (int64_t i = 0; i < n_edges; i++) S.order_d[S.cnt[dst[edge_ids[i]]]++] = i;

  S.ptr_s.assign(n_src, 0);
  S.ptr_d.assign(n_dst, 0);
  S.visited.assign(n_edges, 0);
  // per-node slices: node u owns order_s[u*deg .. u*deg+deg) (deg-regular)
  auto next_from_src = [&](int64_t u) -> int64_t {
    int64_t& p = S.ptr_s[u];
    while (p < deg) {
      int64_t i = S.order_s[u * deg + p];
      p++;
      if (!S.visited[i]) return i;
    }
    return -1;
  };
  auto next_from_dst = [&](int64_t v) -> int64_t {
    int64_t& p = S.ptr_d[v];
    while (p < deg) {
      int64_t i = S.order_d[v * deg + p];
      p++;
      if (!S.visited[i]) return i;
    }
    return -1;
  };
  for (int64_t i0 = 0; i0 < n_edges; i0++) {
    if (S.visited[i0]) continue;
    int64_t i = i0;
    const bool first = true;
    while (i >= 0) {
      S.visited[i] = 1;
      side[i] = first;
      int64_t v = dst[edge_ids[i]];
      int64_t i2 = next_from_dst(v);
      if (i2 < 0) break;
      S.visited[i2] = 1;
      side[i2] = !first;
      int64_t u = src[edge_ids[i2]];
      i = next_from_src(u);
    }
  }
}

// Proper deg-edge-coloring by recursive Euler splitting (deg a power of 2).
void edge_color(const int64_t* src, const int64_t* dst, int64_t* edge_ids,
                int64_t n_edges, int64_t deg, int64_t base, int64_t* colors,
                EulerScratch& S, std::vector<uint8_t>& side_buf,
                std::vector<int64_t>& tmp) {
  if (deg == 1) {
    for (int64_t i = 0; i < n_edges; i++) colors[edge_ids[i]] = base;
    return;
  }
  side_buf.resize(n_edges);
  euler_split(src, dst, edge_ids, n_edges, deg, side_buf.data(), S);
  // stable partition into [first half | second half]
  tmp.resize(n_edges);
  int64_t a = 0, b = 0;
  for (int64_t i = 0; i < n_edges; i++)
    if (side_buf[i]) edge_ids[a++] = edge_ids[i];
    else tmp[b++] = edge_ids[i];
  std::memcpy(edge_ids + a, tmp.data(), b * sizeof(int64_t));
  // NOTE: side_buf is indexed per-local-edge; after partition the halves
  // are contiguous: [0, a) colored from `base`, [a, a+b) from `base+deg/2`
  edge_color(src, dst, edge_ids, a, deg / 2, base, colors, S, side_buf, tmp);
  edge_color(src, dst, edge_ids + a, b, deg / 2, base + deg / 2, colors, S,
             side_buf, tmp);
}

struct Ctx {
  EulerScratch S;
  std::vector<uint8_t> side_buf;
  std::vector<int64_t> tmp;
};

// 3-stage (m <= 128) or single-crossbar route of a permutation of n = m*128.
// Writes g1 (m,128), g3 (128,m), g5 (m,128). Returns stage count (1 or 3).
int route3(const int64_t* dest, int64_t n, int32_t* g1, int32_t* g3,
           int32_t* g5, Ctx& C) {
  int64_t m = n / RADIX;
  if (m == 1) {
    for (int64_t i = 0; i < n; i++) g1[dest[i]] = (int32_t)i;
    return 1;
  }
  std::vector<int64_t> src(n), dst(n), ids(n), color(n);
  for (int64_t i = 0; i < n; i++) {
    src[i] = i / RADIX;
    dst[i] = dest[i] / RADIX;
    ids[i] = i;
  }
  edge_color(src.data(), dst.data(), ids.data(), n, RADIX, 0, color.data(),
             C.S, C.side_buf, C.tmp);
  std::vector<int64_t> sub_dest(RADIX * m);
  for (int64_t i = 0; i < n; i++) {
    int64_t c = color[i];
    g1[src[i] * RADIX + c] = (int32_t)(i % RADIX);
    sub_dest[c * m + src[i]] = dst[i];
    g5[dst[i] * RADIX + dest[i] % RADIX] = (int32_t)c;
  }
  for (int64_t c = 0; c < RADIX; c++)
    for (int64_t p = 0; p < m; p++) g3[c * m + sub_dest[c * m + p]] = (int32_t)p;
  return 3;
}

}  // namespace

extern "C" {

// Route a permutation of n = m*128 (m <= 128, or m = B*128 with B <= 128).
// g1 (m,128), g5 (m,128); 3-stage: g3 (128,m); 5-stage: g2 (128B,128),
// g3 (128*128,B), g4 (128B,128). Returns the stage count (1, 3 or 5),
// or -1 on an unsupported size.
int64_t clos_route_c(const int64_t* dest, int64_t n, int32_t* g1, int32_t* g2,
                     int32_t* g3, int32_t* g4, int32_t* g5) {
  if (n % RADIX) return -1;
  int64_t m = n / RADIX;
  Ctx C;
  if (m <= RADIX) return route3(dest, n, g1, g3, g5, C);
  if (m % RADIX || m > RADIX * RADIX) return -1;
  int64_t B = m / RADIX;

  std::vector<int64_t> src(n), dst(n), ids(n), color(n);
  for (int64_t i = 0; i < n; i++) {
    src[i] = i / RADIX;
    dst[i] = dest[i] / RADIX;
    ids[i] = i;
  }
  edge_color(src.data(), dst.data(), ids.data(), n, RADIX, 0, color.data(),
             C.S, C.side_buf, C.tmp);
  std::vector<int64_t> sub_dest(RADIX * m);
  for (int64_t i = 0; i < n; i++) {
    int64_t c = color[i];
    g1[src[i] * RADIX + c] = (int32_t)(i % RADIX);
    sub_dest[c * m + src[i]] = dst[i];
    g5[dst[i] * RADIX + dest[i] % RADIX] = (int32_t)c;
  }
  std::vector<int32_t> s3(RADIX * B);
  for (int64_t c = 0; c < RADIX; c++) {
    // each middle subnet is itself a 3-stage Clos of size m = B*128
    int stages = route3(sub_dest.data() + c * m, m, g2 + c * B * RADIX,
                        s3.data(), g4 + c * B * RADIX, C);
    if (stages != 3) return -2;
    std::memcpy(g3 + c * RADIX * B, s3.data(), RADIX * B * sizeof(int32_t));
  }
  return 5;
}

}  // extern "C"
