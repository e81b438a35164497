"""Native host runtime: ctypes bindings with pure-Python/cv2 fallbacks.

The shared library is built on demand from ``src/native_ops.cpp`` with the
system g++ (no pybind11 dependency; plain C ABI). If compilation is
unavailable the package still works through the fallback implementations,
just slower.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "native_ops.cpp")
_SO = os.path.join(_HERE, "libnative_ops.so")

_lib: Optional[ctypes.CDLL] = None
_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_SO)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        c = ctypes.c_int
        lib.levenshtein_i32.argtypes = [i32p, c, i32p, c]
        lib.levenshtein_i32.restype = c
        lib.fill_polygon.argtypes = [f32p, c, c, c, u8p]
        lib.fill_polygon_with_outline.argtypes = [f32p, c, c, c, u8p]
        lib.edt_sq.argtypes = [u8p, c, c, f32p]
        lib.polygon_area.argtypes = [f32p, c]
        lib.polygon_area.restype = ctypes.c_double
        lib.polygon_perimeter.argtypes = [f32p, c]
        lib.polygon_perimeter.restype = ctypes.c_double
        lib.det_gt_maps.argtypes = [
            f32p, i32p, c, c, c,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, c,
            f32p, f32p, f32p, f32p,
        ]
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.find_contours.argtypes = [u8p, c, c, i32p, c, i32p, c]
        lib.find_contours.restype = c
        lib.approx_poly_dp.argtypes = [f32p, c, ctypes.c_float, f32p]
        lib.approx_poly_dp.restype = c
        lib.get_perspective_transform.argtypes = [f32p, f32p, f64p]
        lib.get_perspective_transform.restype = c
        lib.warp_perspective_u8.argtypes = [u8p, c, c, c, f64p, u8p, c, c]
        lib.resize_bilinear_u8.argtypes = [u8p, c, c, c, u8p, c, c]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# --------------------------------------------------------------------------- #
# Public API (native with fallback)
# --------------------------------------------------------------------------- #


def levenshtein(a: str, b: str) -> int:
    """Edit distance between two strings (unicode-codepoint level)."""
    lib = _load()
    if lib is not None:
        aa = np.frombuffer(a.encode("utf-32-le"), dtype=np.int32).copy()
        bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.int32).copy()
        return int(lib.levenshtein_i32(aa, len(aa), bb, len(bb)))
    # Pure-Python DP fallback.
    n, m = len(a), len(b)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        ai = a[i - 1]
        for j in range(1, m + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ai != b[j - 1]))
        prev = cur
    return prev[m]


def polygon_area(pts: np.ndarray) -> float:
    pts = np.ascontiguousarray(pts, dtype=np.float32)
    lib = _load()
    if lib is not None:
        return float(lib.polygon_area(pts, len(pts)))
    x, y = pts[:, 0], pts[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)) / 2)


def polygon_perimeter(pts: np.ndarray) -> float:
    pts = np.ascontiguousarray(pts, dtype=np.float32)
    lib = _load()
    if lib is not None:
        return float(lib.polygon_perimeter(pts, len(pts)))
    d = np.diff(np.vstack([pts, pts[:1]]), axis=0)
    return float(np.sqrt((d ** 2).sum(-1)).sum())


def edt(mask: np.ndarray) -> np.ndarray:
    """Exact Euclidean distance (not squared) to the nearest zero pixel."""
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w = mask.shape
    lib = _load()
    if lib is not None:
        out = np.empty((h, w), np.float32)
        lib.edt_sq(mask, h, w, out)
        return np.sqrt(out)
    import cv2

    return cv2.distanceTransform(mask, cv2.DIST_L2, cv2.DIST_MASK_PRECISE)


def find_contours(mask: np.ndarray) -> list:
    """Binary mask -> list of (N, 2) float32 (x, y) contours.

    Suzuki-Abe border following with CHAIN_APPROX_SIMPLE-style run
    compression — RETR_LIST semantics (outer + hole borders), matching
    the reference's ``cv2.findContours`` call (`src/det/test.py:60`).
    """
    mask = np.ascontiguousarray((np.asarray(mask) > 0), dtype=np.uint8)
    h, w = mask.shape
    lib = _load()
    if lib is not None:
        pts_cap = max(h * w, 16)
        pts = np.empty((pts_cap, 2), np.int32)
        counts = np.empty(4096, np.int32)
        n = int(lib.find_contours(mask, h, w, pts.reshape(-1), pts_cap,
                                  counts, 4096))
        out, off = [], 0
        for i in range(n):
            m = int(counts[i])
            out.append(pts[off : off + m].astype(np.float32))
            off += m
        return out
    import cv2

    contours, _ = cv2.findContours(mask * 255, cv2.RETR_LIST,
                                   cv2.CHAIN_APPROX_SIMPLE)
    return [cnt.reshape(-1, 2).astype(np.float32) for cnt in contours]


def approx_poly_dp(pts: np.ndarray, epsilon: float) -> np.ndarray:
    """Douglas-Peucker simplification of a CLOSED polygon
    (cv2.approxPolyDP(closed=True), `src/det/test.py:69-70`)."""
    pts = np.ascontiguousarray(pts, np.float32).reshape(-1, 2)
    lib = _load()
    if lib is not None:
        out = np.empty_like(pts)
        m = int(lib.approx_poly_dp(pts.reshape(-1), len(pts),
                                   np.float32(epsilon), out.reshape(-1)))
        return out[:m]
    import cv2

    approx = cv2.approxPolyDP(pts.reshape(-1, 1, 2), epsilon, True)
    return approx.reshape(-1, 2).astype(np.float32)


def min_area_rect(pts: np.ndarray) -> np.ndarray:
    """Minimum-area enclosing rectangle of a point set -> its 4 corners,
    (4, 2) float32 (cv2.boxPoints(cv2.minAreaRect(...)) equivalent,
    `scanner.py:126-130`). Rotating calipers over the convex hull — the
    optimal rectangle shares an edge direction with the hull, so only
    hull-edge angles need checking. Pure numpy; a few dozen points, so no
    C++ needed."""
    pts = np.ascontiguousarray(pts, np.float32).reshape(-1, 2)
    if len(pts) == 0:
        return np.zeros((4, 2), np.float32)
    if len(pts) == 1:
        return np.repeat(pts, 4, axis=0)
    # Andrew's monotone chain convex hull.
    P = pts[np.lexsort((pts[:, 1], pts[:, 0]))].astype(np.float64)

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    hull = np.asarray(half(P)[:-1] + half(P[::-1])[:-1])
    if len(hull) < 3:
        hull = np.unique(P, axis=0)
    edges = np.roll(hull, -1, axis=0) - hull
    angles = np.unique(np.mod(np.arctan2(edges[:, 1], edges[:, 0]), np.pi / 2))
    best, best_area = None, np.inf
    for a in angles:
        c, s = np.cos(a), np.sin(a)
        R = np.array([[c, s], [-s, c]])
        rot = hull @ R.T
        lo, hi = rot.min(axis=0), rot.max(axis=0)
        area = np.prod(hi - lo)
        if area < best_area:
            best_area = area
            corners = np.array([[lo[0], lo[1]], [hi[0], lo[1]],
                                [hi[0], hi[1]], [lo[0], hi[1]]])
            best = corners @ R
    return best.astype(np.float32)


def get_perspective_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3x3 homography mapping 4 src points to 4 dst points
    (cv2.getPerspectiveTransform, `scanner.py:50`)."""
    src = np.ascontiguousarray(src, np.float32).reshape(4, 2)
    dst = np.ascontiguousarray(dst, np.float32).reshape(4, 2)
    lib = _load()
    if lib is not None:
        M = np.empty(9, np.float64)
        if lib.get_perspective_transform(src.reshape(-1), dst.reshape(-1), M):
            return M.reshape(3, 3)
        return np.eye(3)
    import cv2

    return cv2.getPerspectiveTransform(src, dst).astype(np.float64)


def warp_perspective(img: np.ndarray, M: np.ndarray, out_wh) -> np.ndarray:
    """Forward-homography perspective warp, bilinear, zero border
    (cv2.warpPerspective, `scanner.py:51`). out_wh = (width, height)."""
    ow, oh = int(out_wh[0]), int(out_wh[1])
    img = np.ascontiguousarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    lib = _load()
    if lib is not None and img.dtype == np.uint8:
        h, w, c = img.shape
        out = np.empty((oh, ow, c), np.uint8)
        lib.warp_perspective_u8(img, h, w, c,
                                np.ascontiguousarray(M, np.float64).reshape(-1),
                                out, oh, ow)
        return out[:, :, 0] if squeeze else out
    import cv2

    out = cv2.warpPerspective(img[:, :, 0] if squeeze else img,
                              np.asarray(M, np.float64), (ow, oh))
    return out


def resize_bilinear(img: np.ndarray, out_wh) -> np.ndarray:
    """Bilinear resize with cv2.resize INTER_LINEAR's half-pixel
    convention. out_wh = (width, height)."""
    ow, oh = int(out_wh[0]), int(out_wh[1])
    img = np.ascontiguousarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    lib = _load()
    if lib is not None and img.dtype == np.uint8:
        h, w, c = img.shape
        out = np.empty((oh, ow, c), np.uint8)
        lib.resize_bilinear_u8(img, h, w, c, out, oh, ow)
        return out[:, :, 0] if squeeze else out
    import cv2

    out = cv2.resize(img[:, :, 0] if squeeze else img, (ow, oh),
                     interpolation=cv2.INTER_LINEAR)
    return out


def fill_poly(shape, pts: np.ndarray) -> np.ndarray:
    """Rasterize one polygon into a uint8 mask (cv2.fillPoly semantics:
    interior + boundary)."""
    h, w = int(shape[0]), int(shape[1])
    pts = np.ascontiguousarray(pts, np.float32).reshape(-1, 2)
    lib = _load()
    if lib is not None:
        out = np.zeros((h, w), np.uint8)
        lib.fill_polygon_with_outline(pts.reshape(-1), len(pts), h, w, out)
        return out
    import cv2

    out = np.zeros((h, w), np.uint8)
    cv2.fillPoly(out, [pts.astype(np.int32)], 1)
    return out


def det_gt_maps(
    polygons: Sequence[np.ndarray],
    h: int,
    w: int,
    shrink_ratio: float = 0.4,
    thresh_min: float = 0.3,
    thresh_max: float = 0.7,
    is_training: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """DBNet GT maps for one image: (gt, mask, thresh_map, thresh_mask).

    Native path runs the whole per-image loop in C++ (the reference's
    data-pipeline bottleneck, ~120 clipper ops per image); the fallback
    composes the same raster-offset construction with cv2.
    """
    polys = [np.asarray(p, np.float32).reshape(-1, 2) for p in polygons if len(p) >= 3]
    lib = _load()
    if lib is not None:
        counts = np.asarray([len(p) for p in polys], np.int32)
        flat = (
            np.concatenate([p.reshape(-1) for p in polys])
            if polys
            else np.zeros((0,), np.float32)
        )
        flat = np.ascontiguousarray(flat, np.float32)
        gt = np.empty((h, w), np.float32)
        mask = np.empty((h, w), np.float32)
        tm = np.empty((h, w), np.float32)
        tk = np.empty((h, w), np.float32)
        lib.det_gt_maps(
            flat, counts, len(polys), h, w,
            np.float32(shrink_ratio), np.float32(thresh_min), np.float32(thresh_max),
            int(is_training), gt, mask, tm, tk,
        )
        return gt, mask, tm, tk
    return _det_gt_maps_cv2(polys, h, w, shrink_ratio, thresh_min, thresh_max,
                            is_training)


def _det_gt_maps_cv2(polys, h, w, shrink_ratio, thresh_min, thresh_max, is_training):
    import cv2

    gt = np.zeros((h, w), np.float32)
    mask = np.ones((h, w), np.float32)
    thresh_map = np.zeros((h, w), np.float32)
    thresh_mask = np.zeros((h, w), np.float32)
    for poly in polys:
        cp = poly.copy()
        cp[:, 0] = np.clip(cp[:, 0], 0, w - 1)
        cp[:, 1] = np.clip(cp[:, 1], 0, h - 1)
        area = polygon_area(cp)
        per = polygon_perimeter(cp)
        pm = np.zeros((h, w), np.uint8)
        cv2.fillPoly(pm, [cp.astype(np.int32)], 1)
        if area < 1 or per < 1:
            mask[pm > 0] = 0.0
            continue
        d = area * (1 - shrink_ratio ** 2) / per
        dist_in = cv2.distanceTransform(pm, cv2.DIST_L2, cv2.DIST_MASK_PRECISE)
        dist_out = cv2.distanceTransform(1 - pm, cv2.DIST_L2, cv2.DIST_MASK_PRECISE)
        shrunk = (pm > 0) & (dist_in >= d)
        if shrunk.any():
            gt[shrunk] = 1.0
        else:
            mask[pm > 0] = 0.0
        if is_training and d >= 1:
            band = (pm > 0) | (dist_out <= d)
            thresh_mask[band] = 1.0
            dist = np.minimum(dist_in, dist_out)
            nd = np.clip(dist / d, 0, 1)
            tv = thresh_max - nd * (thresh_max - thresh_min)
            upd = band & (tv > thresh_map)
            thresh_map[upd] = tv[upd]
    return gt, mask, thresh_map, thresh_mask
