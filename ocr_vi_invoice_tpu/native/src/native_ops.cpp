// ocr_vi_invoice_tpu native host runtime.
//
// First-party C++ replacing the reference's native dependencies on the
// host path (SURVEY.md §2.4): pyclipper/shapely polygon math and
// cv2.distanceTransform in det GT-map generation
// (reference src/det/dataloader.py:71-194) and the editdistance package
// (src/rec2/val.py:11). Exposed via a plain C ABI for ctypes.
//
// Geometry note: the reference shrinks/dilates polygons with Vatti
// clipping (round joins) and then rasterizes. An inward/outward offset by
// distance d of a filled region equals thresholding its exact Euclidean
// distance transform at d, so we rasterize first and offset in raster
// space with Felzenszwalb's EDT — one pass, no polygon clipping library,
// and byte-equivalent GT maps for loss purposes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Levenshtein distance over unicode code points.
// ---------------------------------------------------------------------------
int levenshtein_i32(const int32_t* a, int n, const int32_t* b, int m) {
  if (n == 0) return m;
  if (m == 0) return n;
  std::vector<int> prev(m + 1), cur(m + 1);
  for (int j = 0; j <= m; ++j) prev[j] = j;
  for (int i = 1; i <= n; ++i) {
    cur[0] = i;
    for (int j = 1; j <= m; ++j) {
      int cost = (a[i - 1] == b[j - 1]) ? 0 : 1;
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost});
    }
    std::swap(prev, cur);
  }
  return prev[m];
}

// ---------------------------------------------------------------------------
// Scanline polygon fill (even-odd rule, float vertices), matching
// cv2.fillPoly closely enough for GT purposes.
// ---------------------------------------------------------------------------
void fill_polygon(const float* pts, int n, int h, int w, uint8_t* out) {
  for (int y = 0; y < h; ++y) {
    std::vector<float> xs;
    float fy = (float)y + 0.0f;
    for (int i = 0; i < n; ++i) {
      float x0 = pts[2 * i], y0 = pts[2 * i + 1];
      float x1 = pts[2 * ((i + 1) % n)], y1 = pts[2 * ((i + 1) % n) + 1];
      if ((y0 <= fy && y1 > fy) || (y1 <= fy && y0 > fy)) {
        float t = (fy - y0) / (y1 - y0);
        xs.push_back(x0 + t * (x1 - x0));
      }
    }
    std::sort(xs.begin(), xs.end());
    for (size_t k = 0; k + 1 < xs.size(); k += 2) {
      int xa = (int)std::ceil(xs[k] - 0.5f);
      int xb = (int)std::floor(xs[k + 1] - 0.5f + 1.0f);
      xa = std::max(xa, 0);
      xb = std::min(xb, w);
      for (int x = xa; x < xb; ++x) out[y * w + x] = 1;
    }
  }
}

// ---------------------------------------------------------------------------
// Exact Euclidean distance transform (Felzenszwalb & Huttenlocher).
// dist[i] = distance to nearest zero pixel of `mask` (mask!=0 -> inside).
// ---------------------------------------------------------------------------
// Bresenham outline of a polygon — cv2.fillPoly also paints the boundary,
// which matters when a degenerate polygon rasterizes to an empty interior.
static void draw_polygon_outline(const float* pts, int n, int h, int w,
                                 uint8_t* out) {
  for (int i = 0; i < n; ++i) {
    int x0 = (int)std::lround(pts[2 * i]);
    int y0 = (int)std::lround(pts[2 * i + 1]);
    int x1 = (int)std::lround(pts[2 * ((i + 1) % n)]);
    int y1 = (int)std::lround(pts[2 * ((i + 1) % n) + 1]);
    int dx = std::abs(x1 - x0), sx = x0 < x1 ? 1 : -1;
    int dy = -std::abs(y1 - y0), sy = y0 < y1 ? 1 : -1;
    int err = dx + dy;
    while (true) {
      if (y0 >= 0 && y0 < h && x0 >= 0 && x0 < w) out[y0 * w + x0] = 1;
      if (x0 == x1 && y0 == y1) break;
      int e2 = 2 * err;
      if (e2 >= dy) { err += dy; x0 += sx; }
      if (e2 <= dx) { err += dx; y0 += sy; }
    }
  }
}

static void edt_1d(const float* f, float* d, int n, int* v, float* z) {
  int k = 0;
  v[0] = 0;
  z[0] = -1e20f;
  z[1] = 1e20f;
  for (int q = 1; q < n; ++q) {
    float s;
    while (true) {
      s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2.0f * q - 2.0f * v[k]);
      if (s <= z[k]) { --k; } else break;
    }
    ++k;
    v[k] = q;
    z[k] = s;
    z[k + 1] = 1e20f;
  }
  k = 0;
  for (int q = 0; q < n; ++q) {
    while (z[k + 1] < q) ++k;
    float dq = q - v[k];
    d[q] = dq * dq + f[v[k]];
  }
}

// squared EDT of a binary mask: distance from each pixel to nearest pixel
// where mask==0. Pixels where mask==0 get 0.
void edt_sq(const uint8_t* mask, int h, int w, float* out) {
  const float INF = 1e20f;
  std::vector<float> f(std::max(h, w)), d(std::max(h, w));
  std::vector<int> v(std::max(h, w));
  std::vector<float> z(std::max(h, w) + 1);

  // Column pass.
  std::vector<float> tmp((size_t)h * w);
  for (int x = 0; x < w; ++x) {
    for (int y = 0; y < h; ++y) f[y] = mask[y * w + x] ? INF : 0.0f;
    edt_1d(f.data(), d.data(), h, v.data(), z.data());
    for (int y = 0; y < h; ++y) tmp[(size_t)y * w + x] = d[y];
  }
  // Row pass.
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) f[x] = tmp[(size_t)y * w + x];
    edt_1d(f.data(), d.data(), w, v.data(), z.data());
    for (int x = 0; x < w; ++x) out[(size_t)y * w + x] = d[x];
  }
}

static double poly_area(const float* pts, int n) {
  double a = 0;
  for (int i = 0; i < n; ++i) {
    double x0 = pts[2 * i], y0 = pts[2 * i + 1];
    double x1 = pts[2 * ((i + 1) % n)], y1 = pts[2 * ((i + 1) % n) + 1];
    a += x0 * y1 - x1 * y0;
  }
  return std::abs(a) * 0.5;
}

static double poly_perimeter(const float* pts, int n) {
  double p = 0;
  for (int i = 0; i < n; ++i) {
    double dx = pts[2 * ((i + 1) % n)] - pts[2 * i];
    double dy = pts[2 * ((i + 1) % n) + 1] - pts[2 * i + 1];
    p += std::sqrt(dx * dx + dy * dy);
  }
  return p;
}

double polygon_area(const float* pts, int n) { return poly_area(pts, n); }
double polygon_perimeter(const float* pts, int n) { return poly_perimeter(pts, n); }

// cv2.fillPoly paints interior AND boundary; compose both for parity.
void fill_polygon_with_outline(const float* pts, int n, int h, int w,
                               uint8_t* out) {
  fill_polygon(pts, n, h, w, out);
  draw_polygon_outline(pts, n, h, w, out);
}

// ---------------------------------------------------------------------------
// Full DBNet ground-truth map generation for one image.
//
// polys: concatenated (x, y) float vertices; counts[i] = #vertices of
// polygon i. Writes gt (shrunk regions), mask (1, zeroed where shrink
// fails), thresh_map and thresh_mask — semantics of
// reference dataloader.py:299-362 (_shrink_polygon, _draw_border_map).
// is_training != 0 computes threshold maps; otherwise they stay zero.
// ---------------------------------------------------------------------------
void det_gt_maps(const float* polys, const int* counts, int num_polys,
                 int h, int w, float shrink_ratio, float thresh_min,
                 float thresh_max, int is_training, float* gt, float* mask,
                 float* thresh_map, float* thresh_mask) {
  size_t N = (size_t)h * w;
  std::fill(gt, gt + N, 0.0f);
  std::fill(mask, mask + N, 1.0f);
  std::fill(thresh_map, thresh_map + N, 0.0f);
  std::fill(thresh_mask, thresh_mask + N, 0.0f);

  // All per-polygon work runs in a padded bounding-box window: every
  // pixel this polygon can touch (its interior, its outline, and the
  // dilation band of radius d) lies within bbox ⊕ (d + 2), and for those
  // pixels the window-restricted EDT equals the full-image EDT (the
  // nearest boundary/region pixel is itself inside the window). Identical
  // output to the former full-image formulation at a fraction of the
  // cost — the old code ran 2 full-image EDTs per polygon, ~390 ms per
  // 20-polygon training image; windows are typically 100-500x smaller.
  std::vector<uint8_t> poly_mask;
  std::vector<float> dist_in, dist_out;
  std::vector<uint8_t> inv;
  std::vector<float> cp;

  const float* p = polys;
  for (int i = 0; i < num_polys; ++i) {
    int n = counts[i];
    if (n < 3) { p += 2 * n; continue; }

    // Clip vertices to image bounds (reference does the same).
    cp.resize(2 * n);
    for (int k = 0; k < n; ++k) {
      cp[2 * k] = std::min(std::max(p[2 * k], 0.0f), (float)(w - 1));
      cp[2 * k + 1] = std::min(std::max(p[2 * k + 1], 0.0f), (float)(h - 1));
    }
    p += 2 * n;

    double area = poly_area(cp.data(), n);
    double per = poly_perimeter(cp.data(), n);
    double d = (area < 1.0 || per < 1.0)
                   ? 0.0
                   : area * (1.0 - (double)shrink_ratio * shrink_ratio) / per;

    // Padded window.
    float xmin = cp[0], xmax = cp[0], ymin = cp[1], ymax = cp[1];
    for (int k = 1; k < n; ++k) {
      xmin = std::min(xmin, cp[2 * k]);
      xmax = std::max(xmax, cp[2 * k]);
      ymin = std::min(ymin, cp[2 * k + 1]);
      ymax = std::max(ymax, cp[2 * k + 1]);
    }
    int pad = (int)std::ceil(d) + 2;
    int x0 = std::max((int)std::floor(xmin) - pad, 0);
    int y0 = std::max((int)std::floor(ymin) - pad, 0);
    int x1 = std::min((int)std::ceil(xmax) + pad + 1, w);
    int y1 = std::min((int)std::ceil(ymax) + pad + 1, h);
    int wh = y1 - y0, ww = x1 - x0;
    if (wh <= 0 || ww <= 0) continue;
    size_t WN = (size_t)wh * ww;

    // Shift vertices into window coords and rasterize there.
    for (int k = 0; k < n; ++k) {
      cp[2 * k] -= (float)x0;
      cp[2 * k + 1] -= (float)y0;
    }
    poly_mask.assign(WN, 0);
    fill_polygon(cp.data(), n, wh, ww, poly_mask.data());

    auto zero_mask_region = [&]() {
      draw_polygon_outline(cp.data(), n, wh, ww, poly_mask.data());
      for (int y = 0; y < wh; ++y)
        for (int x = 0; x < ww; ++x)
          if (poly_mask[(size_t)y * ww + x])
            mask[(size_t)(y + y0) * w + (x + x0)] = 0.0f;
    };

    if (area < 1.0 || per < 1.0) {
      // Invalid polygon: ignore region (incl. its outline) in loss.
      zero_mask_region();
      continue;
    }

    // Distance to the region boundary, both sides.
    dist_in.resize(WN);
    dist_out.resize(WN);
    inv.resize(WN);
    edt_sq(poly_mask.data(), wh, ww, dist_in.data());
    for (size_t k = 0; k < WN; ++k) inv[k] = poly_mask[k] ? 0 : 1;
    edt_sq(inv.data(), wh, ww, dist_out.data());

    // --- probability map: inward offset by d (erosion) ---
    double d2 = d * d;
    bool any_shrunk = false;
    for (int y = 0; y < wh; ++y)
      for (int x = 0; x < ww; ++x) {
        size_t k = (size_t)y * ww + x;
        if (poly_mask[k] && dist_in[k] >= d2) {
          gt[(size_t)(y + y0) * w + (x + x0)] = 1.0f;
          any_shrunk = true;
        }
      }
    if (!any_shrunk) {
      // Shrink annihilated the polygon -> exclude region from loss.
      zero_mask_region();
    }

    // --- threshold map: border band = dilation by d ---
    if (is_training && d >= 1.0) {
      for (int y = 0; y < wh; ++y)
        for (int x = 0; x < ww; ++x) {
          size_t k = (size_t)y * ww + x;
          bool in_band = poly_mask[k] || dist_out[k] <= d2;
          if (!in_band) continue;
          size_t g = (size_t)(y + y0) * w + (x + x0);
          thresh_mask[g] = 1.0f;
          float dist = std::sqrt(std::min(dist_in[k], dist_out[k]));
          float nd = std::min(dist / (float)d, 1.0f);
          float tv = thresh_max - nd * (thresh_max - thresh_min);
          if (tv > thresh_map[g]) thresh_map[g] = tv;
        }
    }
  }
}

// ---------------------------------------------------------------------------
// Contour tracing: Suzuki-Abe border following (the algorithm behind
// cv2.findContours, reference src/det/test.py:60), RETR_LIST semantics —
// outer AND hole borders — with CHAIN_APPROX_SIMPLE-style compression of
// straight runs. Point coords are (x, y) like cv2.
// ---------------------------------------------------------------------------

// 8-neighborhood, counterclockwise starting east: 0=E 1=NE 2=N 3=NW 4=W 5=SW 6=S 7=SE
static const int nbx[8] = {1, 1, 0, -1, -1, -1, 0, 1};
static const int nby[8] = {0, -1, -1, -1, 0, 1, 1, 1};

static void trace_border(std::vector<int32_t>& f, int h, int w, int sy,
                         int sx, int start_dir, int nbd,
                         std::vector<int>& xs, std::vector<int>& ys) {
  auto F = [&](int y, int x) -> int32_t& { return f[(size_t)y * w + x]; };
  auto inb = [&](int y, int x) { return y >= 0 && y < h && x >= 0 && x < w; };
  auto nz = [&](int y, int x) { return inb(y, x) && F(y, x) != 0; };

  // 3.1: clockwise from start_dir, find first nonzero neighbor of (sy,sx).
  int d1 = -1;
  for (int k = 0; k < 8; ++k) {
    int d = (start_dir - k + 8) % 8;  // clockwise
    if (nz(sy + nby[d], sx + nbx[d])) { d1 = d; break; }
  }
  if (d1 < 0) {  // isolated pixel
    F(sy, sx) = -nbd;
    xs.push_back(sx);
    ys.push_back(sy);
    return;
  }
  int i2 = sy + nby[d1], j2 = sx + nbx[d1];
  int i3 = sy, j3 = sx;
  while (true) {
    // 3.3: counterclockwise from the pixel after (i2,j2), around (i3,j3).
    int dprev = -1;
    for (int d = 0; d < 8; ++d)
      if (i2 == i3 + nby[d] && j2 == j3 + nbx[d]) { dprev = d; break; }
    bool examined_east_zero = false;
    int d4 = -1;
    for (int k = 1; k <= 8; ++k) {
      int d = (dprev + k) % 8;  // counterclockwise
      int yy = i3 + nby[d], xx = j3 + nbx[d];
      if (nz(yy, xx)) { d4 = d; break; }
      if (d == 0) examined_east_zero = true;  // east neighbor examined & zero
    }
    // 3.4: mark
    if (examined_east_zero)
      F(i3, j3) = -nbd;
    else if (F(i3, j3) == 1)
      F(i3, j3) = nbd;
    xs.push_back(j3);
    ys.push_back(i3);
    int i4 = i3 + nby[d4], j4 = j3 + nbx[d4];
    // 3.5: termination — back at start and about to repeat first move.
    if (i4 == sy && j4 == sx && i3 == sy + nby[d1] && j3 == sx + nbx[d1])
      break;
    i2 = i3; j2 = j3;
    i3 = i4; j3 = j4;
  }
}

// Compress straight runs (CHAIN_APPROX_SIMPLE): keep only direction changes.
static void compress_chain(const std::vector<int>& xs, const std::vector<int>& ys,
                           std::vector<int>& ox, std::vector<int>& oy) {
  int n = (int)xs.size();
  if (n <= 2) { ox = xs; oy = ys; return; }
  for (int i = 0; i < n; ++i) {
    int p = (i - 1 + n) % n, q = (i + 1) % n;
    int d0x = xs[i] - xs[p], d0y = ys[i] - ys[p];
    int d1x = xs[q] - xs[i], d1y = ys[q] - ys[i];
    if (d0x != d1x || d0y != d1y) { ox.push_back(xs[i]); oy.push_back(ys[i]); }
  }
  if (ox.empty()) { ox.push_back(xs[0]); oy.push_back(ys[0]); }
}

// Returns #contours written. out_pts holds (x, y) int32 pairs concatenated;
// out_counts[i] = #points of contour i. Contours that would overflow the
// caller's buffers are dropped (callers pass h*w-sized buffers).
int find_contours(const uint8_t* mask, int h, int w, int32_t* out_pts,
                  int pts_cap, int32_t* out_counts, int contours_cap) {
  std::vector<int32_t> f((size_t)h * w);
  for (size_t k = 0; k < (size_t)h * w; ++k) f[k] = mask[k] ? 1 : 0;
  int nbd = 1, n_contours = 0, pts_used = 0;
  for (int i = 0; i < h; ++i) {
    for (int j = 0; j < w; ++j) {
      int32_t fij = f[(size_t)i * w + j];
      if (fij == 0) continue;
      bool outer = (fij == 1) && (j == 0 || f[(size_t)i * w + j - 1] == 0);
      bool hole = (fij >= 1) && (j == w - 1 || f[(size_t)i * w + j + 1] == 0);
      if (!outer && !hole) continue;
      ++nbd;
      std::vector<int> xs, ys, cx, cy;
      trace_border(f, h, w, i, j, outer ? 4 : 0, nbd, xs, ys);
      compress_chain(xs, ys, cx, cy);
      int m = (int)cx.size();
      if (n_contours >= contours_cap || pts_used + m > pts_cap) continue;
      for (int k = 0; k < m; ++k) {
        out_pts[2 * (pts_used + k)] = cx[k];
        out_pts[2 * (pts_used + k) + 1] = cy[k];
      }
      out_counts[n_contours++] = m;
      pts_used += m;
    }
  }
  return n_contours;
}

// ---------------------------------------------------------------------------
// Douglas-Peucker polygon simplification (cv2.approxPolyDP, closed curves —
// reference src/det/test.py:69-70).
// ---------------------------------------------------------------------------
static float seg_dist_sq(float px, float py, float ax, float ay, float bx,
                         float by) {
  float vx = bx - ax, vy = by - ay;
  float wx = px - ax, wy = py - ay;
  float vv = vx * vx + vy * vy;
  if (vv <= 1e-12f) return wx * wx + wy * wy;
  float t = (wx * vx + wy * vy) / vv;
  t = std::min(std::max(t, 0.0f), 1.0f);
  float dx = wx - t * vx, dy = wy - t * vy;
  return dx * dx + dy * dy;
}

static void dp_arc(const float* pts, int n, int a, int b, float eps2,
                   std::vector<char>& keep) {
  // arc from index a to b going forward with wraparound (a != b)
  int len = (b - a + n) % n;
  if (len < 2) return;
  float ax = pts[2 * a], ay = pts[2 * a + 1];
  float bx = pts[2 * b], by = pts[2 * b + 1];
  float maxd = -1.0f;
  int idx = -1;
  for (int k = 1; k < len; ++k) {
    int i = (a + k) % n;
    float d = seg_dist_sq(pts[2 * i], pts[2 * i + 1], ax, ay, bx, by);
    if (d > maxd) { maxd = d; idx = i; }
  }
  if (maxd > eps2) {
    keep[idx] = 1;
    dp_arc(pts, n, a, idx, eps2, keep);
    dp_arc(pts, n, idx, b, eps2, keep);
  }
}

// Simplify closed polygon; writes <=n points to out, returns count.
int approx_poly_dp(const float* pts, int n, float eps, float* out) {
  if (n <= 2) {
    for (int i = 0; i < 2 * n; ++i) out[i] = pts[i];
    return n;
  }
  // Split the ring at two far-apart anchor points, then DP each arc.
  int p0 = 0;
  float best = -1.0f;
  for (int i = 1; i < n; ++i) {
    float dx = pts[2 * i] - pts[0], dy = pts[2 * i + 1] - pts[1];
    float d = dx * dx + dy * dy;
    if (d > best) { best = d; p0 = i; }
  }
  int p1 = 0;
  best = -1.0f;
  for (int i = 0; i < n; ++i) {
    float dx = pts[2 * i] - pts[2 * p0], dy = pts[2 * i + 1] - pts[2 * p0 + 1];
    float d = dx * dx + dy * dy;
    if (d > best) { best = d; p1 = i; }
  }
  std::vector<char> keep(n, 0);
  keep[p0] = keep[p1] = 1;
  float eps2 = eps * eps;
  dp_arc(pts, n, p0, p1, eps2, keep);
  dp_arc(pts, n, p1, p0, eps2, keep);
  int m = 0;
  for (int i = 0; i < n; ++i)
    if (keep[i]) { out[2 * m] = pts[2 * i]; out[2 * m + 1] = pts[2 * i + 1]; ++m; }
  return m;
}

// ---------------------------------------------------------------------------
// Perspective transform + warp (cv2.getPerspectiveTransform /
// cv2.warpPerspective — reference src/preprocess/scanner.py:50-51).
// ---------------------------------------------------------------------------
static bool solve_gauss(double a[8][9]) {
  for (int col = 0; col < 8; ++col) {
    int piv = col;
    for (int r = col + 1; r < 8; ++r)
      if (std::abs(a[r][col]) > std::abs(a[piv][col])) piv = r;
    if (std::abs(a[piv][col]) < 1e-12) return false;
    if (piv != col)
      for (int c = 0; c < 9; ++c) std::swap(a[piv][c], a[col][c]);
    for (int r = 0; r < 8; ++r) {
      if (r == col) continue;
      double m = a[r][col] / a[col][col];
      for (int c = col; c < 9; ++c) a[r][c] -= m * a[col][c];
    }
  }
  for (int r = 0; r < 8; ++r) a[r][8] /= a[r][r];
  return true;
}

// src, dst: 4 (x, y) points each. M: row-major 3x3 with M[8] = 1.
int get_perspective_transform(const float* src, const float* dst, double* M) {
  double a[8][9] = {};
  for (int i = 0; i < 4; ++i) {
    double x = src[2 * i], y = src[2 * i + 1];
    double u = dst[2 * i], v = dst[2 * i + 1];
    double* r0 = a[2 * i];
    double* r1 = a[2 * i + 1];
    r0[0] = x; r0[1] = y; r0[2] = 1; r0[6] = -u * x; r0[7] = -u * y; r0[8] = u;
    r1[3] = x; r1[4] = y; r1[5] = 1; r1[6] = -v * x; r1[7] = -v * y; r1[8] = v;
  }
  if (!solve_gauss(a)) return 0;
  for (int i = 0; i < 8; ++i) M[i] = a[i][8];
  M[8] = 1.0;
  return 1;
}

static bool invert3x3(const double* m, double* inv) {
  double det = m[0] * (m[4] * m[8] - m[5] * m[7]) -
               m[1] * (m[3] * m[8] - m[5] * m[6]) +
               m[2] * (m[3] * m[7] - m[4] * m[6]);
  if (std::abs(det) < 1e-12) return false;
  double id = 1.0 / det;
  inv[0] = (m[4] * m[8] - m[5] * m[7]) * id;
  inv[1] = (m[2] * m[7] - m[1] * m[8]) * id;
  inv[2] = (m[1] * m[5] - m[2] * m[4]) * id;
  inv[3] = (m[5] * m[6] - m[3] * m[8]) * id;
  inv[4] = (m[0] * m[8] - m[2] * m[6]) * id;
  inv[5] = (m[2] * m[3] - m[0] * m[5]) * id;
  inv[6] = (m[3] * m[7] - m[4] * m[6]) * id;
  inv[7] = (m[1] * m[6] - m[0] * m[7]) * id;
  inv[8] = (m[0] * m[4] - m[1] * m[3]) * id;
  return true;
}

// Forward homography M (like cv2); inverse-maps each output pixel and
// bilinear-samples, zero border. uint8 HxWxC.
void warp_perspective_u8(const uint8_t* img, int h, int w, int c,
                         const double* M, uint8_t* out, int oh, int ow) {
  double inv[9];
  if (!invert3x3(M, inv)) {
    std::memset(out, 0, (size_t)oh * ow * c);
    return;
  }
  for (int y = 0; y < oh; ++y) {
    for (int x = 0; x < ow; ++x) {
      double sw_ = inv[6] * x + inv[7] * y + inv[8];
      double sx = (inv[0] * x + inv[1] * y + inv[2]) / sw_;
      double sy = (inv[3] * x + inv[4] * y + inv[5]) / sw_;
      uint8_t* o = out + ((size_t)y * ow + x) * c;
      int x0 = (int)std::floor(sx), y0 = (int)std::floor(sy);
      float fx = (float)(sx - x0), fy = (float)(sy - y0);
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.0f;
        for (int dy2 = 0; dy2 <= 1; ++dy2) {
          for (int dx2 = 0; dx2 <= 1; ++dx2) {
            int yy = y0 + dy2, xx = x0 + dx2;
            float wgt = (dx2 ? fx : 1 - fx) * (dy2 ? fy : 1 - fy);
            float val = (yy >= 0 && yy < h && xx >= 0 && xx < w)
                            ? (float)img[((size_t)yy * w + xx) * c + ch]
                            : 0.0f;
            acc += wgt * val;
          }
        }
        o[ch] = (uint8_t)std::min(std::max((int)std::lround(acc), 0), 255);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Bilinear resize (cv2.resize INTER_LINEAR convention: src = (dst+0.5)*s-0.5)
// ---------------------------------------------------------------------------
void resize_bilinear_u8(const uint8_t* img, int h, int w, int c, uint8_t* out,
                        int oh, int ow) {
  double sy_ = (double)h / oh, sx_ = (double)w / ow;
  for (int y = 0; y < oh; ++y) {
    double sy = (y + 0.5) * sy_ - 0.5;
    int y0 = (int)std::floor(sy);
    float fy = (float)(sy - y0);
    int ya = std::min(std::max(y0, 0), h - 1);
    int yb = std::min(std::max(y0 + 1, 0), h - 1);
    for (int x = 0; x < ow; ++x) {
      double sx = (x + 0.5) * sx_ - 0.5;
      int x0 = (int)std::floor(sx);
      float fx = (float)(sx - x0);
      int xa = std::min(std::max(x0, 0), w - 1);
      int xb = std::min(std::max(x0 + 1, 0), w - 1);
      uint8_t* o = out + ((size_t)y * ow + x) * c;
      for (int ch = 0; ch < c; ++ch) {
        float v = (1 - fy) * ((1 - fx) * img[((size_t)ya * w + xa) * c + ch] +
                              fx * img[((size_t)ya * w + xb) * c + ch]) +
                  fy * ((1 - fx) * img[((size_t)yb * w + xa) * c + ch] +
                        fx * img[((size_t)yb * w + xb) * c + ch]);
        o[ch] = (uint8_t)std::min(std::max((int)std::lround(v), 0), 255);
      }
    }
  }
}

}  // extern "C"
