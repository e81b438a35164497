"""Document defect simulator: 16 degradations + composite presets.

Capability parity with `generator/det/defects.py:20-717`: stains,
creases, crumple shading, shadows (linear/radial/corner), gaussian and
salt&pepper noise, sand-grain noise (deliberate false-positive trigger
for the detector), gaussian/motion blur, local strip blur, broken-text
streaks, brightness/contrast, toner loss, handwritten marks,
staple/punch holes, torn edges — plus light/medium/heavy presets.

All functions: uint8 RGB in/out, numpy + cv2, pure host side.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import cv2
import numpy as np


def _clip8(x) -> np.ndarray:
    return np.clip(x, 0, 255).astype(np.uint8)


class DefectSimulator:
    # ---------------- surface damage ----------------

    @staticmethod
    def stain(rng, img):
        """Coffee/grease blotches: soft elliptical dark patches."""
        h, w = img.shape[:2]
        out = img.astype(np.float32)
        for _ in range(rng.randint(1, 4)):
            cx, cy = rng.randint(0, w), rng.randint(0, h)
            ax, ay = rng.randint(w // 12, w // 4), rng.randint(h // 12, h // 4)
            mask = np.zeros((h, w), np.float32)
            cv2.ellipse(mask, (cx, cy), (ax, ay), rng.randint(0, 180), 0, 360,
                        1.0, -1)
            mask = cv2.GaussianBlur(mask, (0, 0), max(ax, ay) / 3)
            tint = np.array([rng.uniform(0.55, 0.9), rng.uniform(0.5, 0.85),
                             rng.uniform(0.45, 0.8)], np.float32)
            out *= 1 - mask[..., None] * (1 - tint)
        return _clip8(out)

    @staticmethod
    def crease(rng, img):
        """Fold lines: a bright+dark line pair across the page."""
        h, w = img.shape[:2]
        out = img.astype(np.float32)
        for _ in range(rng.randint(1, 3)):
            horizontal = rng.rand() < 0.5
            pos = rng.randint(h // 5, 4 * h // 5) if horizontal else \
                rng.randint(w // 5, 4 * w // 5)
            band = np.zeros((h, w), np.float32)
            if horizontal:
                band[max(pos - 2, 0): pos + 3, :] = 1.0
            else:
                band[:, max(pos - 2, 0): pos + 3] = 1.0
            band = cv2.GaussianBlur(band, (0, 0), 3)
            out *= 1 - band[..., None] * rng.uniform(0.1, 0.3)
        return _clip8(out)

    @staticmethod
    def crumple(rng, img):
        """Global crumple shading: low-frequency multiplicative noise."""
        h, w = img.shape[:2]
        g = rng.randn(h // 24 + 2, w // 24 + 2).astype(np.float32)
        g = cv2.resize(g, (w, h), interpolation=cv2.INTER_CUBIC)
        g = cv2.GaussianBlur(g, (0, 0), 9)
        g = 1.0 + g / max(np.abs(g).max(), 1e-6) * rng.uniform(0.08, 0.22)
        return _clip8(img.astype(np.float32) * g[..., None])

    @staticmethod
    def shadow(rng, img):
        """Linear / radial / corner shadow."""
        h, w = img.shape[:2]
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        kind = rng.randint(3)
        if kind == 0:  # linear
            theta = rng.uniform(0, math.pi)
            proj = xx * math.cos(theta) + yy * math.sin(theta)
            proj = (proj - proj.min()) / max(np.ptp(proj), 1e-6)
            shade = 1 - rng.uniform(0.2, 0.5) * proj
        elif kind == 1:  # radial
            cx, cy = rng.randint(0, w), rng.randint(0, h)
            r = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
            shade = 1 - rng.uniform(0.2, 0.5) * (r / r.max())
        else:  # corner
            cx = 0 if rng.rand() < 0.5 else w - 1
            cy = 0 if rng.rand() < 0.5 else h - 1
            r = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
            shade = 1 - rng.uniform(0.25, 0.55) * (1 - r / r.max())
        return _clip8(img.astype(np.float32) * shade[..., None])

    # ---------------- sensor noise ----------------

    @staticmethod
    def gaussian_noise(rng, img, sigma_range=(5, 25)):
        sigma = rng.uniform(*sigma_range)
        return _clip8(img.astype(np.float32) + rng.randn(*img.shape) * sigma)

    @staticmethod
    def salt_pepper(rng, img, amount_range=(0.002, 0.015)):
        out = img.copy()
        amount = rng.uniform(*amount_range)
        n = int(amount * img.shape[0] * img.shape[1])
        ys = rng.randint(0, img.shape[0], n)
        xs = rng.randint(0, img.shape[1], n)
        out[ys[: n // 2], xs[: n // 2]] = 255
        out[ys[n // 2:], xs[n // 2:]] = 0
        return out

    @staticmethod
    def sand_grain(rng, img):
        """Clustered dark speckles — a detector false-positive trigger
        (reference defects.py:216-255)."""
        h, w = img.shape[:2]
        out = img.copy()
        for _ in range(rng.randint(2, 6)):
            cx, cy = rng.randint(0, w), rng.randint(0, h)
            spread = rng.randint(15, 60)
            n = rng.randint(40, 200)
            xs = np.clip(rng.normal(cx, spread, n).astype(int), 0, w - 1)
            ys = np.clip(rng.normal(cy, spread, n).astype(int), 0, h - 1)
            shade = rng.randint(20, 110)
            for x, y in zip(xs, ys):
                r = rng.randint(1, 3)
                cv2.circle(out, (x, y), r, (shade, shade, shade), -1)
        return out

    # ---------------- optics ----------------

    @staticmethod
    def blur(rng, img):
        if rng.rand() < 0.5:
            k = int(rng.choice([3, 5, 7]))
            return cv2.GaussianBlur(img, (k, k), 0)
        k = rng.randint(5, 13)
        kernel = np.zeros((k, k), np.float32)
        ang = rng.uniform(0, math.pi)
        c = (k - 1) / 2
        for t in np.linspace(-c, c, 2 * k):
            x = int(round(c + t * math.cos(ang)))
            y = int(round(c + t * math.sin(ang)))
            if 0 <= x < k and 0 <= y < k:
                kernel[y, x] = 1
        kernel /= kernel.sum()
        return cv2.filter2D(img, -1, kernel)

    @staticmethod
    def local_strip_blur(rng, img):
        """Blur one horizontal/vertical strip (motion during scan,
        reference defects.py:293-331)."""
        h, w = img.shape[:2]
        out = img.copy()
        if rng.rand() < 0.5:
            y0 = rng.randint(0, max(h - h // 4, 1))
            strip = out[y0: y0 + h // 4]
            out[y0: y0 + h // 4] = cv2.GaussianBlur(strip, (0, 0), rng.uniform(2, 5))
        else:
            x0 = rng.randint(0, max(w - w // 4, 1))
            strip = out[:, x0: x0 + w // 4]
            out[:, x0: x0 + w // 4] = cv2.GaussianBlur(strip, (0, 0), rng.uniform(2, 5))
        return out

    @staticmethod
    def broken_text(rng, img):
        """Thin paper-colored streaks through text (printer banding,
        reference defects.py:333-363)."""
        h, w = img.shape[:2]
        out = img.copy()
        paper = np.percentile(img.reshape(-1, 3), 90, axis=0).astype(np.uint8)
        for _ in range(rng.randint(2, 8)):
            y = rng.randint(0, h)
            t = rng.randint(1, 3)
            out[y: y + t, :] = paper
        return out

    # ---------------- exposure / print quality ----------------

    @staticmethod
    def brightness_contrast(rng, img):
        alpha = rng.uniform(0.7, 1.3)
        beta = rng.uniform(-40, 40)
        return _clip8(img.astype(np.float32) * alpha + beta)

    @staticmethod
    def toner_loss(rng, img):
        """Faded print: pull dark pixels toward paper in random patches."""
        h, w = img.shape[:2]
        mask = rng.rand(h // 8 + 1, w // 8 + 1).astype(np.float32)
        mask = cv2.resize(mask, (w, h))
        mask = (mask > rng.uniform(0.5, 0.8)).astype(np.float32)
        mask = cv2.GaussianBlur(mask, (0, 0), 5)
        fade = rng.uniform(0.4, 0.8)
        out = img.astype(np.float32)
        out = out + (255 - out) * mask[..., None] * fade
        return _clip8(out)

    # ---------------- human damage ----------------

    @staticmethod
    def handwritten_marks(rng, img):
        """Pen scribbles/circles over the document."""
        h, w = img.shape[:2]
        out = img.copy()
        color = (int(rng.randint(0, 90)), int(rng.randint(0, 90)),
                 int(rng.randint(90, 200)))
        for _ in range(rng.randint(1, 4)):
            kind = rng.randint(3)
            if kind == 0:  # scribble polyline
                pts = np.stack([rng.randint(0, w, 6), rng.randint(0, h, 6)], 1)
                cv2.polylines(out, [pts.astype(np.int32)], False, color, 2)
            elif kind == 1:  # circle around something
                cv2.ellipse(out, (rng.randint(0, w), rng.randint(0, h)),
                            (rng.randint(20, 60), rng.randint(10, 30)),
                            rng.randint(0, 180), 0, 360, color, 2)
            else:  # check/cross mark
                x, y = rng.randint(0, w - 20), rng.randint(0, h - 20)
                cv2.line(out, (x, y), (x + 15, y + 15), color, 2)
                cv2.line(out, (x + 15, y), (x, y + 15), color, 2)
        return out

    @staticmethod
    def staple_holes(rng, img):
        """Staples and punch holes near an edge."""
        h, w = img.shape[:2]
        out = img.copy()
        if rng.rand() < 0.5:  # punch holes on the left
            x = rng.randint(8, 25)
            for frac in (0.25, 0.75):
                cv2.circle(out, (x, int(h * frac)), rng.randint(5, 9),
                           (245, 245, 245), -1)
                cv2.circle(out, (x, int(h * frac)), rng.randint(5, 9),
                           (120, 120, 120), 1)
        else:  # staple top-left
            x, y = rng.randint(5, 40), rng.randint(5, 25)
            ang = rng.uniform(-0.8, 0.8)
            dx, dy = int(18 * math.cos(ang)), int(18 * math.sin(ang))
            cv2.line(out, (x, y), (x + dx, y + dy), (90, 90, 100), 2)
        return out

    @staticmethod
    def torn_edges(rng, img):
        """Jagged torn-off corners/edges replaced by background."""
        h, w = img.shape[:2]
        out = img.copy()
        bg = int(rng.randint(180, 240))
        n_tears = rng.randint(1, 3)
        for _ in range(n_tears):
            edge = rng.randint(4)
            depth = rng.randint(10, max(min(h, w) // 6, 12))
            steps = rng.randint(6, 14)
            pts = []
            if edge in (0, 1):  # top/bottom
                y_base = 0 if edge == 0 else h
                xs = np.linspace(0, w, steps)
                for x in xs:
                    pts.append([x, y_base + (depth * rng.rand()) * (1 if edge == 0 else -1)])
                pts = [[0, y_base]] + pts + [[w, y_base]]
            else:  # left/right
                x_base = 0 if edge == 2 else w
                ys = np.linspace(0, h, steps)
                for y in ys:
                    pts.append([x_base + (depth * rng.rand()) * (1 if edge == 2 else -1), y])
                pts = [[x_base, 0]] + pts + [[x_base, h]]
            cv2.fillPoly(out, [np.asarray(pts, np.int32)], (bg, bg, bg))
        return out

    # ---------------- presets ----------------

    _LIGHT: List[str] = ["brightness_contrast", "gaussian_noise", "blur", "shadow"]
    _MEDIUM: List[str] = _LIGHT + ["stain", "crease", "salt_pepper",
                                   "toner_loss", "local_strip_blur"]
    _HEAVY: List[str] = _MEDIUM + ["crumple", "sand_grain", "broken_text",
                                   "handwritten_marks", "staple_holes",
                                   "torn_edges"]

    @classmethod
    def _apply_random(cls, rng, img, pool: List[str], k_range: Tuple[int, int]):
        k = rng.randint(k_range[0], k_range[1] + 1)
        chosen = rng.choice(len(pool), size=min(k, len(pool)), replace=False)
        for idx in chosen:
            img = getattr(cls, pool[int(idx)])(rng, img)
        return img


def apply_defects_light(rng, img):
    return DefectSimulator._apply_random(rng, img, DefectSimulator._LIGHT, (1, 2))


def apply_defects_medium(rng, img):
    return DefectSimulator._apply_random(rng, img, DefectSimulator._MEDIUM, (2, 4))


def apply_defects_heavy(rng, img):
    return DefectSimulator._apply_random(rng, img, DefectSimulator._HEAVY, (3, 6))
