"""Narrow thermal-printer receipt layouts (mono fonts, 260-420px)."""

from __future__ import annotations

from ocr_vi_invoice_tpu.generator.base_layout import BaseLayout, LayoutConfig


class SupermarketThermal(BaseLayout):
    """Narrow mono receipt with a barcode block (bars unannotated)."""

    name = "supermarket_thermal"

    def __init__(self, rng, config=None, fonts=None):
        cfg = config or LayoutConfig(
            width_range=(280, 380), font_role="mono", bold_role="mono_bold",
            base_font_size=15, margin=10, line_gap=4,
        )
        super().__init__(rng, cfg, fonts)

    def _barcode(self):
        m, y0 = self.cfg.margin, self.y
        x = m + int(self.rng.randint(0, 30))
        h = 34
        while x < self.width - m - 4:
            bw = int(self.rng.randint(1, 4))
            if self.rng.rand() < 0.55:
                self._draw.rectangle([x, y0, x + bw - 1, y0 + h],
                                     fill=self.cfg.ink_color)
            x += bw + int(self.rng.randint(1, 3))
        self.y = y0 + h + self.cfg.line_gap
        self.line(f"{self.rng.randint(10**12, 10**13 - 1)}",
                  size=self.cfg.base_font_size - 3, align="center")

    def render(self):
        self.header_block()
        self.separator("=")
        self.title_block()
        self.two_col_line("Thu ngân:", f"NV{self.rng.randint(1, 99):02d}",
                          size=self.cfg.base_font_size - 2)
        self.separator()
        total = self.items_block_simple(int(self.rng.randint(4, 14)))
        self.separator()
        self.payment_block(total)
        self.separator("=")
        self._barcode()
        self.footer_block()


class CafeMinimal(BaseLayout):
    """Sparse centered cafe receipt with few items."""

    name = "cafe_minimal"

    def __init__(self, rng, config=None, fonts=None):
        cfg = config or LayoutConfig(
            width_range=(300, 400), font_role="sans", bold_role="sans_bold",
            base_font_size=17, margin=18, line_gap=8,
        )
        super().__init__(rng, cfg, fonts)

    def render(self):
        c = self.content
        self.line(c.shop_name(), size=self.cfg.base_font_size + 8, bold=True,
                  align="center")
        self.space(4)
        self.line(c.datetime_str(), size=self.cfg.base_font_size - 3,
                  align="center")
        self.line(c.invoice_no(), size=self.cfg.base_font_size - 3,
                  align="center")
        self.space(12)
        total = self.items_block_simple(int(self.rng.randint(1, 5)))
        self.space(10)
        self.hline()
        self.two_col_line("Tổng", c.money(total), bold=True,
                          size=self.cfg.base_font_size + 2)
        self.footer_block()


class ModernPOS(BaseLayout):
    """POS receipt: order number, cashier/counter lines, dense items."""

    name = "modern_pos"

    def __init__(self, rng, config=None, fonts=None):
        cfg = config or LayoutConfig(
            width_range=(340, 440), font_role="sans", bold_role="sans_bold",
            base_font_size=16, margin=12, line_gap=5,
        )
        super().__init__(rng, cfg, fonts)

    def render(self):
        c = self.content
        self.header_block(center=True)
        self.hline(2)
        self.line(f"ĐƠN HÀNG #{self.rng.randint(1, 9999):04d}",
                  size=self.cfg.base_font_size + 3, bold=True, align="center")
        self.two_col_line("Quầy:", f"{self.rng.randint(1, 9)}",
                          size=self.cfg.base_font_size - 2)
        self.two_col_line("Thu ngân:", c.choice(
            ["Lan", "Hùng", "Mai", "Tuấn", "Hoa", "Nam"]),
            size=self.cfg.base_font_size - 2)
        self.two_col_line("Ngày:", c.datetime_str(),
                          size=self.cfg.base_font_size - 2)
        self.hline()
        total = self.items_block_simple(int(self.rng.randint(3, 11)))
        self.hline()
        self.payment_block(total)
        if self.rng.rand() < 0.5:
            self.line("* Giá đã bao gồm VAT", size=self.cfg.base_font_size - 4)
        self.footer_block()


class TraditionalMarket(BaseLayout):
    """Simple market chit: irregular spacing, terse totals."""

    name = "traditional_market"

    def __init__(self, rng, config=None, fonts=None):
        cfg = config or LayoutConfig(
            width_range=(260, 360), font_role="sans", bold_role="sans_bold",
            base_font_size=16, margin=14, line_gap=int(rng.randint(4, 12)),
            jitter=2,
        )
        super().__init__(rng, cfg, fonts)

    def render(self):
        c = self.content
        self.line(c.shop_name(), bold=True)
        if self.rng.rand() < 0.5:
            self.line(c.phone(), size=self.cfg.base_font_size - 2)
        self.space(8)
        total = 0
        for _ in range(int(self.rng.randint(2, 7))):
            name = c.item()
            price = c.price(2, 120)
            total += price
            self.two_col_line(name[:20], c.money(price))
        self.space(6)
        self.two_col_line("Cộng:", c.money(total), bold=True,
                          size=self.cfg.base_font_size + 2)
