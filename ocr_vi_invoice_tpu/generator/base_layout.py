"""Layout base class for synthetic invoice rendering.

Design equivalent of `generator/det/layouts/base_layout.py`: a PIL canvas,
text-drawing helpers that record a ``{text, polygon}`` annotation for
every string (the detector GT), a bordered-table renderer whose borders
are deliberately NOT annotated (only text regions are text), and shared
invoice building blocks (header, info lines, item rows, payment block,
footer) that concrete layouts compose.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw

from ocr_vi_invoice_tpu.generator.content import ContentProvider
from ocr_vi_invoice_tpu.generator.fonts import FontManager, default_fonts


@dataclass
class LayoutConfig:
    width_range: Tuple[int, int] = (400, 600)
    margin: int = 16
    line_gap: int = 6
    font_role: str = "sans"
    bold_role: str = "sans_bold"
    base_font_size: int = 18
    paper_color: Tuple[int, int, int] = (255, 255, 255)
    ink_color: Tuple[int, int, int] = (20, 20, 20)
    jitter: int = 0  # per-string position jitter (handwritten style)


class BaseLayout:
    """Stateful renderer: subclasses implement ``render()`` using the
    drawing helpers; every helper records annotations."""

    name = "base"

    def __init__(self, rng: np.random.RandomState,
                 config: Optional[LayoutConfig] = None,
                 fonts: Optional[FontManager] = None):
        self.rng = rng
        self.cfg = config or LayoutConfig()
        self.fonts = fonts or default_fonts()
        self.content = ContentProvider(rng)
        self.width = int(rng.randint(*self.cfg.width_range))
        self.annotations: List[Dict] = []
        # Canvas starts tall; cropped to content in finish().
        self._img = Image.new("RGB", (self.width, 4000), self.cfg.paper_color)
        self._draw = ImageDraw.Draw(self._img)
        self.y = self.cfg.margin

    # ---------------------------------------------------------------- #
    # Core text primitive
    # ---------------------------------------------------------------- #

    def font(self, size: Optional[int] = None, bold: bool = False):
        role = self.cfg.bold_role if bold else self.cfg.font_role
        return self.fonts.get(role, size or self.cfg.base_font_size)

    def _jitter(self) -> Tuple[int, int]:
        j = self.cfg.jitter
        if j <= 0:
            return 0, 0
        return int(self.rng.randint(-j, j + 1)), int(self.rng.randint(-j, j + 1))

    def draw_text(self, text: str, x: int, y: int, size: Optional[int] = None,
                  bold: bool = False, align: str = "left",
                  color: Optional[Tuple[int, int, int]] = None,
                  annotate: bool = True) -> Tuple[int, int, int, int]:
        """Draw one string; record its polygon. Returns the bbox."""
        text = text.strip()
        if not text:
            return (x, y, x, y)
        f = self.font(size, bold)
        jx, jy = self._jitter()
        bbox = self._draw.textbbox((0, 0), text, font=f)
        tw = bbox[2] - bbox[0]
        if align == "center":
            x = x - tw // 2
        elif align == "right":
            x = x - tw
        x, y = x + jx, y + jy
        self._draw.text((x, y), text, font=f,
                        fill=color or self.cfg.ink_color)
        x0, y0 = x + bbox[0], y + bbox[1]
        x1, y1 = x + bbox[2], y + bbox[3]
        if annotate:
            self.annotations.append({
                "text": text,
                "polygon": [[x0 - 1, y0 - 1], [x1 + 1, y0 - 1],
                            [x1 + 1, y1 + 1], [x0 - 1, y1 + 1]],
            })
        return (x0, y0, x1, y1)

    def line(self, text: str, size: Optional[int] = None, bold: bool = False,
             align: str = "left", gap: Optional[int] = None):
        """Draw a full line at the current cursor and advance it."""
        w = self.width
        m = self.cfg.margin
        if align == "center":
            bbox = self.draw_text(text, w // 2, self.y, size, bold, "center")
        elif align == "right":
            bbox = self.draw_text(text, w - m, self.y, size, bold, "right")
        else:
            bbox = self.draw_text(text, m, self.y, size, bold)
        self.y = max(self.y, bbox[3]) + (gap if gap is not None else self.cfg.line_gap)

    def two_col_line(self, left: str, right: str, size: Optional[int] = None,
                     bold: bool = False):
        m = self.cfg.margin
        b1 = self.draw_text(left, m, self.y, size, bold)
        b2 = self.draw_text(right, self.width - m, self.y, size, bold, "right")
        self.y = max(b1[3], b2[3]) + self.cfg.line_gap

    def separator(self, char: str = "-", annotate: bool = False):
        """Dashed separator; thermal receipts render it as text, but it is
        drawn unannotated by default (not meaningful text)."""
        f = self.font(self.cfg.base_font_size - 4)
        cw = max(self._draw.textbbox((0, 0), char, font=f)[2], 1)
        n = max((self.width - 2 * self.cfg.margin) // cw, 4)
        self._draw.text((self.cfg.margin, self.y), char * n, font=f,
                        fill=self.cfg.ink_color)
        self.y += self._draw.textbbox((0, 0), char, font=f)[3] + self.cfg.line_gap

    def hline(self, thickness: int = 1, color=None):
        self._draw.line(
            [(self.cfg.margin, self.y), (self.width - self.cfg.margin, self.y)],
            fill=color or self.cfg.ink_color, width=thickness,
        )
        self.y += thickness + self.cfg.line_gap

    def space(self, px: int):
        self.y += px

    # ---------------------------------------------------------------- #
    # Composite blocks
    # ---------------------------------------------------------------- #

    def header_block(self, center: bool = True):
        c = self.content
        align = "center" if center else "left"
        self.line(c.shop_name(), size=self.cfg.base_font_size + 6, bold=True,
                  align=align)
        self.line(c.address(), size=self.cfg.base_font_size - 2, align=align)
        if self.rng.rand() < 0.8:
            self.line(f"ĐT: {c.phone()}", size=self.cfg.base_font_size - 2,
                      align=align)
        if self.rng.rand() < 0.4:
            self.line(c.tax_id(), size=self.cfg.base_font_size - 2, align=align)

    def title_block(self):
        c = self.content
        self.space(6)
        self.line(c.header(), size=self.cfg.base_font_size + 4, bold=True,
                  align="center")
        self.line(c.invoice_no(), size=self.cfg.base_font_size - 2, align="center")
        self.line(c.datetime_str(), size=self.cfg.base_font_size - 2,
                  align="center")
        self.space(4)

    def items_block_simple(self, n_items: int):
        """qty x name ... total, one line per item (thermal style)."""
        c = self.content
        total = 0
        for name, qty, unit, price, line_total in c.line_items(n_items):
            self.two_col_line(f"{qty} {unit} {name}"[:38], c.money(line_total),
                              size=self.cfg.base_font_size - 1)
            total += line_total
        return total

    def payment_block(self, total: int, full: bool = True):
        c = self.content
        self.two_col_line("Tổng cộng", c.money(total), bold=True)
        if full and self.rng.rand() < 0.7:
            vat = int(total * 0.08)
            self.two_col_line("VAT (8%)", c.money(vat),
                              size=self.cfg.base_font_size - 2)
            paid = ((total + vat) // 50000 + 1) * 50000
            self.two_col_line("Tiền khách đưa", c.money(paid),
                              size=self.cfg.base_font_size - 2)
            self.two_col_line("Tiền thối lại", c.money(paid - total - vat),
                              size=self.cfg.base_font_size - 2)

    def footer_block(self):
        self.space(8)
        self.line(self.content.footer(), size=self.cfg.base_font_size - 2,
                  align="center")

    def table_block(self, n_items: int, headers: Sequence[str] =
                    ("Tên hàng", "SL", "Đơn giá", "T.Tiền"),
                    bordered: bool = True) -> int:
        """Bordered item table. Border LINES are not annotated; only the
        cell text is (reference base_layout.py:272-352 behaviour)."""
        c = self.content
        m = self.cfg.margin
        w = self.width - 2 * m
        col_fracs = [0.45, 0.12, 0.21, 0.22]
        xs = [m + int(w * sum(col_fracs[:i])) for i in range(len(col_fracs) + 1)]
        fs = self.cfg.base_font_size - 2
        row_h = fs + 12

        def row(cells, bold=False):
            y0 = self.y
            for j, cell in enumerate(cells):
                cx = xs[j] + 4
                self.draw_text(str(cell)[:24], cx, y0 + 4, size=fs, bold=bold)
            self.y = y0 + row_h
            if bordered:
                self._draw.line([(m, y0), (m + w, y0)], fill=self.cfg.ink_color)
                for xx in xs:
                    self._draw.line([(xx, y0), (xx, y0 + row_h)],
                                    fill=self.cfg.ink_color)

        row(headers, bold=True)
        total = 0
        for name, qty, unit, price, line_total in c.line_items(n_items):
            row([name, qty, c.money(price), c.money(line_total)])
            total += line_total
        if bordered:
            self._draw.line([(m, self.y), (m + w, self.y)],
                            fill=self.cfg.ink_color)
        self.space(self.cfg.line_gap + 2)
        return total

    # ---------------------------------------------------------------- #

    def render(self) -> None:
        """Subclasses compose blocks; base renders a generic receipt."""
        self.header_block()
        self.separator()
        self.title_block()
        total = self.items_block_simple(int(self.rng.randint(3, 10)))
        self.separator()
        self.payment_block(total)
        self.footer_block()

    def finish(self) -> Tuple[np.ndarray, List[Dict]]:
        """Crop to content height and return (image, annotations)."""
        h = min(self.y + self.cfg.margin, self._img.height)
        img = np.array(self._img.crop((0, 0, self.width, h)))  # writable copy
        # Clip polygons to the final canvas.
        for ann in self.annotations:
            for pt in ann["polygon"]:
                pt[0] = float(np.clip(pt[0], 0, self.width - 1))
                pt[1] = float(np.clip(pt[1], 0, h - 1))
        return img, self.annotations

    def generate(self) -> Tuple[np.ndarray, List[Dict]]:
        self.render()
        return self.finish()
