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

  std::vector<uint8_t> poly_mask(N);
  std::vector<float> dist_in(N), dist_out(N);
  std::vector<uint8_t> inv(N);

  const float* p = polys;
  for (int i = 0; i < num_polys; ++i) {
    int n = counts[i];
    if (n < 3) { p += 2 * n; continue; }

    // Clip vertices to image bounds (reference does the same).
    std::vector<float> cp(2 * n);
    for (int k = 0; k < n; ++k) {
      cp[2 * k] = std::min(std::max(p[2 * k], 0.0f), (float)(w - 1));
      cp[2 * k + 1] = std::min(std::max(p[2 * k + 1], 0.0f), (float)(h - 1));
    }
    p += 2 * n;

    double area = poly_area(cp.data(), n);
    double per = poly_perimeter(cp.data(), n);
    std::fill(poly_mask.begin(), poly_mask.end(), 0);
    fill_polygon(cp.data(), n, h, w, poly_mask.data());

    if (area < 1.0 || per < 1.0) {
      // Invalid polygon: ignore region (incl. its outline) in loss.
      draw_polygon_outline(cp.data(), n, h, w, poly_mask.data());
      for (size_t k = 0; k < N; ++k)
        if (poly_mask[k]) mask[k] = 0.0f;
      continue;
    }

    double d = area * (1.0 - (double)shrink_ratio * shrink_ratio) / per;

    // Distance to the region boundary, both sides.
    edt_sq(poly_mask.data(), h, w, dist_in.data());
    for (size_t k = 0; k < N; ++k) inv[k] = poly_mask[k] ? 0 : 1;
    edt_sq(inv.data(), h, w, dist_out.data());

    // --- probability map: inward offset by d (erosion) ---
    double d2 = d * d;
    bool any_shrunk = false;
    for (size_t k = 0; k < N; ++k) {
      if (poly_mask[k] && dist_in[k] >= d2) {
        gt[k] = 1.0f;
        any_shrunk = true;
      }
    }
    if (!any_shrunk) {
      // Shrink annihilated the polygon -> exclude region from loss.
      draw_polygon_outline(cp.data(), n, h, w, poly_mask.data());
      for (size_t k = 0; k < N; ++k)
        if (poly_mask[k]) mask[k] = 0.0f;
    }

    // --- threshold map: border band = dilation by d ---
    if (is_training && d >= 1.0) {
      for (size_t k = 0; k < N; ++k) {
        bool in_band = poly_mask[k] || dist_out[k] <= d2;
        if (!in_band) continue;
        thresh_mask[k] = 1.0f;
        float dist = std::sqrt(std::min(dist_in[k], dist_out[k]));
        float nd = std::min(dist / (float)d, 1.0f);
        float tv = thresh_max - nd * (thresh_max - thresh_min);
        if (tv > thresh_map[k]) thresh_map[k] = tv;
      }
    }
  }
}

}  // extern "C"
