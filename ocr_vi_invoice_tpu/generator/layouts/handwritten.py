"""Handwritten note layout: lined paper, jittered text, rotated strings."""

from __future__ import annotations


from ocr_vi_invoice_tpu.generator.base_layout import BaseLayout, LayoutConfig


class Handwritten(BaseLayout):
    """Simulated handwritten sales chit: per-string position jitter,
    slight per-line rotation, lined/grid paper background."""

    name = "handwritten"

    def __init__(self, rng, config=None, fonts=None):
        cfg = config or LayoutConfig(
            width_range=(320, 460), font_role="handwriting",
            bold_role="handwriting", base_font_size=19,
            margin=20, line_gap=int(rng.randint(8, 16)), jitter=3,
            paper_color=(252, 250, 242),
        )
        super().__init__(rng, cfg, fonts)
        self._draw_paper_lines()

    def _draw_paper_lines(self):
        """Ruled-paper background (never annotated)."""
        color = (168, 196, 222)
        gap = int(self.rng.randint(26, 36))
        for y in range(gap, self._img.height, gap):
            self._draw.line([(0, y), (self.width, y)], fill=color, width=1)
        if self.rng.rand() < 0.5:
            x = self.cfg.margin + 8
            self._draw.line([(x, 0), (x, self._img.height)],
                            fill=(228, 160, 160), width=1)

    def render(self):
        c = self.content
        ink = c.choice([(25, 35, 120), (30, 30, 30), (80, 20, 20)])
        self.cfg.ink_color = ink
        self.line(c.shop_name(), size=self.cfg.base_font_size + 3, bold=True)
        self.line(c.datetime_str()[:10], size=self.cfg.base_font_size - 2)
        self.space(8)
        total = 0
        for _ in range(int(self.rng.randint(2, 8))):
            name = c.item()
            qty, unit = c.quantity()
            price = c.price(2, 200)
            total += price * qty
            # handwritten rows drift horizontally
            x = self.cfg.margin + int(self.rng.randint(0, 25))
            b1 = self.draw_text(f"{name} x{qty}", x, self.y,
                                size=self.cfg.base_font_size)
            self.draw_text(c.money(price * qty), self.width - self.cfg.margin
                           - int(self.rng.randint(0, 20)), self.y,
                           size=self.cfg.base_font_size, align="right")
            self.y = b1[3] + self.cfg.line_gap
        self.space(10)
        self.two_col_line("Tổng:", c.money(total), bold=True,
                          size=self.cfg.base_font_size + 4)
        if self.rng.rand() < 0.4:
            self.line(c.choice(["Đã thanh toán", "Còn nợ", "Ghi sổ"]),
                      size=self.cfg.base_font_size)
