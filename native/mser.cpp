// Native MSER detector: margin-stable extremal regions via union-find
// over gray-level-sorted pixels.
//
// TPU-native framework companion to the reference's CMP MSER
// (/root/reference/detectors/mser/extrema/extrema.cpp:92-282 behaviour):
// margin-based stability, min-size / max-area budgets, ellipse fit from
// second moments; MSER+ (dark) and MSER- (bright) via image inversion.
// The component-tree walk is inherently sequential, so it runs on the
// host CPU in C++ (SURVEY.md §7.3) while everything downstream
// (orientation, description, matching) stays on the TPU.
//
// Build: g++ -O3 -shared -fPIC -o libmods_mser.so mser.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Stats {
  double n = 0, sx = 0, sy = 0, sxx = 0, sxy = 0, syy = 0;
  void add(double x, double y) {
    n += 1; sx += x; sy += y; sxx += x * x; sxy += x * y; syy += y * y;
  }
  void merge(const Stats &o) {
    n += o.n; sx += o.sx; sy += o.sy;
    sxx += o.sxx; sxy += o.sxy; syy += o.syy;
  }
};

struct Component {
  Stats cur;        // live statistics
  Stats snap;       // statistics at the most-stable level seen so far
  int birth = 0;          // gray level where this component appeared
  double size_prev = 0;   // size at the end of the previous gray level
  double best_rate = 2.0; // best (lowest) relative growth rate
};

struct Out {
  double x, y, a11, a12, a21, a22, margin;
};

struct UnionFind {
  std::vector<int> parent;
  explicit UnionFind(size_t n) : parent(n, -1) {}
  int find(int i) {
    int r = i;
    while (parent[r] >= 0) r = parent[r];
    while (parent[i] >= 0) { int nxt = parent[i]; parent[i] = r; i = nxt; }
    return r;
  }
};

// 2x2 symmetric square root (the reference's schur_sym + sqrt,
// extrema.cpp:152-155): A = U * sqrt(T) * U^T of covariance C.
void sym_sqrt(double cxx, double cxy, double cyy,
              double &a11, double &a12, double &a21, double &a22) {
  double tr = cxx + cyy;
  double det = cxx * cyy - cxy * cxy;
  if (det < 1e-12) det = 1e-12;
  double disc = tr * tr / 4.0 - det;
  if (disc < 0) disc = 0;
  double l1 = tr / 2.0 + std::sqrt(disc);
  double l2 = tr / 2.0 - std::sqrt(disc);
  if (l2 < 1e-12) l2 = 1e-12;
  // eigenvector for l1
  double vx, vy;
  if (std::abs(cxy) > 1e-12) {
    vx = l1 - cyy; vy = cxy;
  } else {
    vx = 1; vy = 0;
  }
  double nv = std::sqrt(vx * vx + vy * vy);
  vx /= nv; vy /= nv;
  double s1 = std::sqrt(l1), s2 = std::sqrt(l2);
  // A = s1 * v v^T + s2 * w w^T with w = (-vy, vx)
  a11 = s1 * vx * vx + s2 * vy * vy;
  a12 = (s1 - s2) * vx * vy;
  a21 = a12;
  a22 = s1 * vy * vy + s2 * vx * vx;
}

void emit(const Component &c, int level, int min_margin, double min_size,
          double max_size, std::vector<Out> &out) {
  // CMP margin semantics (getExtrema.cpp:344): lifespan in gray levels
  // from the component's appearance to its merge into a larger region.
  int margin = level - c.birth + 1;
  if (margin <= min_margin) return;
  const Stats &s = c.snap.n > 0 ? c.snap : c.cur;
  if (s.n < min_size || s.n > max_size) return;
  double mx = s.sx / s.n, my = s.sy / s.n;
  double cxx = s.sxx / s.n - mx * mx;
  double cxy = s.sxy / s.n - mx * my;
  double cyy = s.syy / s.n - my * my;
  Out o;
  o.x = mx; o.y = my; o.margin = margin;
  sym_sqrt(cxx, cxy, cyy, o.a11, o.a12, o.a21, o.a22);
  out.push_back(o);
}

void detect_polarity(const uint8_t *img, int h, int w, int min_size,
                     double max_area_frac, int min_margin, bool invert,
                     std::vector<Out> &out) {
  const int n = h * w;
  const double max_size = max_area_frac * n;
  // counting sort of pixels by gray value
  std::vector<int> count(257, 0);
  std::vector<uint8_t> g(n);
  for (int i = 0; i < n; i++) {
    g[i] = invert ? 255 - img[i] : img[i];
    count[g[i] + 1]++;
  }
  for (int v = 0; v < 256; v++) count[v + 1] += count[v];
  std::vector<int> order(n);
  {
    std::vector<int> pos(count.begin(), count.end() - 1);
    for (int i = 0; i < n; i++) order[pos[g[i]]++] = i;
  }

  UnionFind uf(n);
  std::vector<Component> comp(n);
  std::vector<uint8_t> added(n, 0);
  std::vector<int> touched;           // roots touched at this level
  std::vector<int> stamp(n, -1);
  touched.reserve(1 << 12);

  int idx = 0;
  for (int level = 0; level < 256; level++) {
    int end = count[level + 1];
    touched.clear();
    for (; idx < end; idx++) {
      int p = order[idx];
      int y = p / w, x = p - y * w;
      added[p] = 1;
      comp[p].cur = Stats();
      comp[p].cur.add(x, y);
      comp[p].snap = Stats();
      comp[p].birth = level;
      comp[p].size_prev = 0;
      comp[p].best_rate = 2.0;
      int root = p;
      const int nb[4] = {x > 0 ? p - 1 : -1, x < w - 1 ? p + 1 : -1,
                         y > 0 ? p - w : -1, y < h - 1 ? p + w : -1};
      for (int k = 0; k < 4; k++) {
        int q = nb[k];
        if (q < 0 || !added[q]) continue;
        int rq = uf.find(q);
        root = uf.find(root);
        if (rq == root) continue;
        // merge smaller into larger; the larger keeps its birth level
        // (getExtrema.cpp MergeRegions)
        int big = comp[root].cur.n >= comp[rq].cur.n ? root : rq;
        int small = big == root ? rq : root;
        // the dying (smaller) component is a finished tree node
        if (comp[small].cur.n > 1)
          emit(comp[small], level, min_margin, min_size, max_size, out);
        comp[big].cur.merge(comp[small].cur);
        uf.parent[small] = big;
        root = big;
      }
      root = uf.find(p);
      if (stamp[root] != level) {
        stamp[root] = level;
        touched.push_back(root);
      }
    }
    // end of gray level: update stability snapshots of touched roots
    // (the most-stable threshold = lowest relative growth rate — the
    // FastSetOptThresholds4StableRegion role)
    for (int r : touched) {
      if (uf.parent[r] >= 0) continue;  // got merged after being touched
      Component &c = comp[r];
      double rate = (c.cur.n - c.size_prev) / c.cur.n;
      if (rate < c.best_rate && c.cur.n > 1) {
        c.best_rate = rate;
        c.snap = c.cur;
      }
      c.size_prev = c.cur.n;
    }
  }
  // end of image: emit all surviving roots
  for (int i = 0; i < n; i++) {
    if (uf.parent[i] < 0 && added[i] && comp[i].cur.n > 1)
      emit(comp[i], 255, min_margin, min_size, max_size, out);
  }
}

}  // namespace

extern "C" {

// Returns number of regions written (<= max_out).  Each output row:
// [x, y, a11, a12, a21, a22, margin, polarity]
int mods_mser_detect(const uint8_t *img, int h, int w, int min_size,
                     double max_area_frac, int min_margin, double *out,
                     int max_out) {
  std::vector<Out> regs_plus, regs_min;
  detect_polarity(img, h, w, min_size, max_area_frac, min_margin,
                  /*invert=*/false, regs_plus);
  detect_polarity(img, h, w, min_size, max_area_frac, min_margin,
                  /*invert=*/true, regs_min);
  int n = 0;
  for (int pol = 0; pol < 2; pol++) {
    const std::vector<Out> &v = pol == 0 ? regs_plus : regs_min;
    for (const Out &o : v) {
      if (n >= max_out) return n;
      double *row = out + n * 8;
      row[0] = o.x; row[1] = o.y;
      row[2] = o.a11; row[3] = o.a12; row[4] = o.a21; row[5] = o.a22;
      row[6] = o.margin; row[7] = pol;
      n++;
    }
  }
  return n;
}
}
