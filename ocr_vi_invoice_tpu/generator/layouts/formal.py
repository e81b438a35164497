"""Wide formal document layouts (serif fonts, bordered tables, 700-1000px)."""

from __future__ import annotations

from ocr_vi_invoice_tpu.generator.base_layout import BaseLayout, LayoutConfig


class FormalVAT(BaseLayout):
    """GTGT (VAT) invoice: seller/buyer blocks, bordered item table,
    amount-in-words, signature boxes."""

    name = "formal_vat"

    def __init__(self, rng, config=None, fonts=None):
        cfg = config or LayoutConfig(
            width_range=(800, 1000), font_role="serif", bold_role="serif_bold",
            base_font_size=20, margin=40, line_gap=8,
        )
        super().__init__(rng, cfg, fonts)

    def render(self):
        c = self.content
        self.line("HÓA ĐƠN GIÁ TRỊ GIA TĂNG", size=self.cfg.base_font_size + 8,
                  bold=True, align="center")
        self.line(f"(Bản thể hiện của hóa đơn điện tử)",
                  size=self.cfg.base_font_size - 4, align="center")
        self.two_col_line(f"Ký hiệu: {c.choice(['1C25TYY', 'K24TUT', '1K23TAB'])}",
                          c.invoice_no(), size=self.cfg.base_font_size - 2)
        self.line(f"Ngày {self.rng.randint(1, 29)} tháng "
                  f"{self.rng.randint(1, 13)} năm 20{self.rng.randint(20, 27)}",
                  align="center", size=self.cfg.base_font_size - 2)
        self.hline(2)
        self.line(f"Đơn vị bán hàng: {c.shop_name()}", bold=True)
        self.line(f"Địa chỉ: {c.address()}")
        self.line(c.tax_id())
        self.space(6)
        self.line(f"Họ tên người mua hàng: "
                  f"{c.choice(['Nguyễn Văn An', 'Trần Thị Bình', 'Lê Hoàng Cường', 'Phạm Thu Dung'])}")
        self.line(f"Địa chỉ: {c.address()}")
        if self.rng.rand() < 0.6:
            self.line(f"Hình thức thanh toán: "
                      f"{c.choice(['TM', 'CK', 'TM/CK'])}")
        self.space(8)
        total = self.table_block(int(self.rng.randint(2, 8)),
                                 headers=("Tên hàng hóa, dịch vụ", "SL",
                                          "Đơn giá", "Thành tiền"),
                                 bordered=True)
        vat = int(total * 0.1)
        self.two_col_line("Cộng tiền hàng:", c.money(total))
        self.two_col_line("Thuế suất GTGT: 10%", c.money(vat))
        self.two_col_line("Tổng cộng tiền thanh toán:", c.money(total + vat),
                          bold=True)
        self.space(16)
        y0 = self.y
        self.draw_text("Người mua hàng", self.width // 4, y0, bold=True,
                       align="center")
        self.draw_text("Người bán hàng", 3 * self.width // 4, y0, bold=True,
                       align="center")
        self.y = y0 + self.cfg.base_font_size + 6
        self.draw_text("(Ký, ghi rõ họ tên)", self.width // 4, self.y,
                       size=self.cfg.base_font_size - 5, align="center")
        self.draw_text("(Ký, đóng dấu)", 3 * self.width // 4, self.y,
                       size=self.cfg.base_font_size - 5, align="center")
        self.space(70)


class UtilityBill(BaseLayout):
    """Electricity/water bill: customer code, usage table, period."""

    name = "utility_bill"

    def __init__(self, rng, config=None, fonts=None):
        cfg = config or LayoutConfig(
            width_range=(700, 900), font_role="serif", bold_role="serif_bold",
            base_font_size=19, margin=36, line_gap=7,
        )
        super().__init__(rng, cfg, fonts)

    def render(self):
        c = self.content
        kind = c.choice(["TIỀN ĐIỆN", "TIỀN NƯỚC", "CƯỚC VIỄN THÔNG"])
        self.line(c.choice(["CÔNG TY ĐIỆN LỰC", "CÔNG TY CẤP NƯỚC",
                            "TẬP ĐOÀN VIỄN THÔNG"]) + " "
                  + c.choice(["MIỀN NAM", "HÀ NỘI", "ĐÀ NẴNG"]),
                  bold=True, align="center")
        self.line(f"HÓA ĐƠN {kind}", size=self.cfg.base_font_size + 5,
                  bold=True, align="center")
        mo = self.rng.randint(1, 13)
        self.line(f"Kỳ: tháng {mo}/20{self.rng.randint(20, 27)}", align="center")
        self.hline(2)
        self.line(f"Mã khách hàng: PE{self.rng.randint(10**8, 10**9 - 1)}")
        self.line(f"Khách hàng: {c.choice(['Nguyễn Văn An', 'Trần Thị Bình', 'Hộ Lê Văn Cao'])}")
        self.line(f"Địa chỉ: {c.address()}")
        self.space(8)
        old = self.rng.randint(1000, 90000)
        used = self.rng.randint(50, 600)
        self.two_col_line("Chỉ số cũ:", f"{old}")
        self.two_col_line("Chỉ số mới:", f"{old + used}")
        self.two_col_line("Sản lượng:", f"{used} kWh")
        amount = used * self.rng.randint(1800, 3500)
        vat = int(amount * 0.08)
        self.hline()
        self.two_col_line("Thành tiền:", c.money(amount))
        self.two_col_line("Thuế GTGT (8%):", c.money(vat))
        self.two_col_line("Tổng cộng:", c.money(amount + vat), bold=True)
        self.space(8)
        self.line(f"Hạn thanh toán: {c.datetime_str()[:10]}",
                  size=self.cfg.base_font_size - 2)
        self.footer_block()


class HotelBill(BaseLayout):
    """Hotel folio: guest/room/dates, nightly charges table."""

    name = "hotel_bill"

    def __init__(self, rng, config=None, fonts=None):
        cfg = config or LayoutConfig(
            width_range=(700, 900), font_role="serif", bold_role="serif_bold",
            base_font_size=19, margin=36, line_gap=7,
        )
        super().__init__(rng, cfg, fonts)

    def render(self):
        c = self.content
        self.line(f"KHÁCH SẠN {c.choice(['HOÀNG GIA', 'MƯỜNG THANH', 'SÀI GÒN', 'BÔNG SEN'])}",
                  size=self.cfg.base_font_size + 5, bold=True, align="center")
        self.line(c.address(), size=self.cfg.base_font_size - 3, align="center")
        self.line("PHIẾU THANH TOÁN / FOLIO", bold=True, align="center")
        self.hline(2)
        self.two_col_line("Khách / Guest:",
                          c.choice(["Nguyễn Văn An", "Trần Thị Bình", "David Smith"]))
        self.two_col_line("Phòng / Room:", f"{self.rng.randint(101, 999)}")
        nights = int(self.rng.randint(1, 6))
        self.two_col_line("Nhận phòng:", c.datetime_str())
        self.two_col_line("Trả phòng:", c.datetime_str())
        self.space(8)
        rate = c.price(300, 1500)
        rows = [("Tiền phòng", nights, c.money(rate), c.money(nights * rate))]
        total = nights * rate
        for _ in range(int(self.rng.randint(0, 4))):
            name = c.choice(["Minibar", "Giặt ủi", "Ăn sáng", "Spa", "Đưa đón"])
            amt = c.price(50, 500)
            rows.append((name, 1, c.money(amt), c.money(amt)))
            total += amt
        m, w = self.cfg.margin, self.width - 2 * self.cfg.margin
        fs = self.cfg.base_font_size - 2
        self.draw_text("Dịch vụ", m + 4, self.y, size=fs, bold=True)
        self.draw_text("SL", m + int(w * 0.5), self.y, size=fs, bold=True)
        self.draw_text("Đơn giá", m + int(w * 0.62), self.y, size=fs, bold=True)
        self.draw_text("Thành tiền", m + w, self.y, size=fs, bold=True,
                       align="right")
        self.y += fs + 10
        self.hline()
        for name, qty, unit_price, line_total in rows:
            self.draw_text(str(name), m + 4, self.y, size=fs)
            self.draw_text(str(qty), m + int(w * 0.5), self.y, size=fs)
            self.draw_text(unit_price, m + int(w * 0.62), self.y, size=fs)
            self.draw_text(line_total, m + w, self.y, size=fs, align="right")
            self.y += fs + 10
        self.hline()
        vat = int(total * 0.1)
        svc = int(total * 0.05)
        self.two_col_line("Phí dịch vụ (5%):", c.money(svc))
        self.two_col_line("VAT (10%):", c.money(vat))
        self.two_col_line("TỔNG CỘNG:", c.money(total + vat + svc), bold=True)
        self.footer_block()
