"""Medium-width receipt layouts (restaurant, delivery, e-commerce, taxi)."""

from __future__ import annotations

from ocr_vi_invoice_tpu.generator.base_layout import BaseLayout, LayoutConfig


class RestaurantBill(BaseLayout):
    """Table number, per-dish lines, service charge."""

    name = "restaurant_bill"

    def __init__(self, rng, config=None, fonts=None):
        cfg = config or LayoutConfig(
            width_range=(360, 480), font_role="sans", bold_role="sans_bold",
            base_font_size=17, margin=16, line_gap=6,
        )
        super().__init__(rng, cfg, fonts)

    def render(self):
        c = self.content
        self.header_block()
        self.hline(2)
        self.two_col_line(f"Bàn: {self.rng.randint(1, 30)}",
                          f"Khách: {self.rng.randint(1, 12)}")
        self.two_col_line("Giờ vào:", c.datetime_str()[11:])
        self.line(c.invoice_no(), size=self.cfg.base_font_size - 2)
        self.separator()
        total = self.items_block_simple(int(self.rng.randint(2, 10)))
        self.separator()
        if self.rng.rand() < 0.5:
            svc = int(total * 0.05)
            self.two_col_line("Phí phục vụ (5%)", c.money(svc),
                              size=self.cfg.base_font_size - 2)
            total += svc
        self.payment_block(total)
        self.footer_block()


class DeliveryReceipt(BaseLayout):
    """Shipping label/receipt: sender/receiver, COD, tracking code."""

    name = "delivery_receipt"

    def __init__(self, rng, config=None, fonts=None):
        cfg = config or LayoutConfig(
            width_range=(420, 560), font_role="sans", bold_role="sans_bold",
            base_font_size=17, margin=18, line_gap=6,
        )
        super().__init__(rng, cfg, fonts)

    def render(self):
        c = self.content
        self.line(c.choice(["GIAO HÀNG NHANH", "GIAO HÀNG TIẾT KIỆM",
                            "VIETTEL POST", "VNPOST", "J&T EXPRESS"]),
                  size=self.cfg.base_font_size + 5, bold=True, align="center")
        code = f"{c.choice(['GHN', 'GHTK', 'VTP', 'JT'])}{self.rng.randint(10**8, 10**9 - 1)}"
        self.line(f"Mã vận đơn: {code}", bold=True, align="center")
        self.hline(2)
        self.line("NGƯỜI GỬI:", bold=True, size=self.cfg.base_font_size - 2)
        self.line(c.shop_name(), size=self.cfg.base_font_size - 1)
        self.line(c.address(), size=self.cfg.base_font_size - 3)
        self.line(f"SĐT: {c.phone()}", size=self.cfg.base_font_size - 3)
        self.space(6)
        self.line("NGƯỜI NHẬN:", bold=True, size=self.cfg.base_font_size - 2)
        self.line(c.choice(["Nguyễn Văn An", "Trần Thị Bình", "Lê Hoàng Cường"]),
                  size=self.cfg.base_font_size - 1)
        self.line(c.address(), size=self.cfg.base_font_size - 3)
        self.line(f"SĐT: {c.phone()}", size=self.cfg.base_font_size - 3)
        self.separator()
        self.two_col_line("Nội dung:", c.item()[:18],
                          size=self.cfg.base_font_size - 2)
        self.two_col_line("Khối lượng:", f"{self.rng.randint(1, 50) / 10:.1f} kg",
                          size=self.cfg.base_font_size - 2)
        self.two_col_line("Tiền thu hộ (COD):", c.money(c.price(0, 2000)),
                          bold=True)
        self.two_col_line("Phí vận chuyển:", c.money(c.price(15, 60)),
                          size=self.cfg.base_font_size - 2)
        self.space(6)
        self.line(f"Ngày gửi: {c.datetime_str()}",
                  size=self.cfg.base_font_size - 3)


class EcommerceReceipt(BaseLayout):
    """Online order confirmation: order id, seller, borderless items,
    shipping fee and discounts."""

    name = "ecommerce_receipt"

    def __init__(self, rng, config=None, fonts=None):
        cfg = config or LayoutConfig(
            width_range=(420, 560), font_role="sans", bold_role="sans_bold",
            base_font_size=17, margin=18, line_gap=6,
        )
        super().__init__(rng, cfg, fonts)

    def render(self):
        c = self.content
        self.line(c.choice(["SHOPEE", "LAZADA", "TIKI", "SENDO"]),
                  size=self.cfg.base_font_size + 6, bold=True, align="center")
        self.line("XÁC NHẬN ĐƠN HÀNG", bold=True, align="center")
        self.hline(2)
        self.two_col_line("Mã đơn hàng:",
                          f"{self.rng.randint(10**10, 10**11 - 1)}")
        self.two_col_line("Ngày đặt:", c.datetime_str())
        self.two_col_line("Người bán:", c.shop_name()[:24])
        self.separator()
        total = self.table_block(int(self.rng.randint(1, 6)), bordered=False)
        ship = c.price(15, 50)
        disc = c.price(0, 30) if self.rng.rand() < 0.6 else 0
        self.two_col_line("Phí vận chuyển:", c.money(ship),
                          size=self.cfg.base_font_size - 2)
        if disc:
            self.two_col_line("Giảm giá:", f"-{c.money(disc)}",
                              size=self.cfg.base_font_size - 2)
        self.two_col_line("Tổng thanh toán:", c.money(total + ship - disc),
                          bold=True)
        self.two_col_line("Thanh toán:", c.choice(["COD", "Ví điện tử",
                                                   "Thẻ tín dụng", "Chuyển khoản"]),
                          size=self.cfg.base_font_size - 2)


class TaxiReceipt(BaseLayout):
    """Narrow taxi/ride receipt: plate, distance, fare breakdown."""

    name = "taxi_receipt"

    def __init__(self, rng, config=None, fonts=None):
        cfg = config or LayoutConfig(
            width_range=(280, 360), font_role="mono", bold_role="mono_bold",
            base_font_size=15, margin=12, line_gap=5,
        )
        super().__init__(rng, cfg, fonts)

    def render(self):
        c = self.content
        self.line(c.choice(["TAXI MAI LINH", "VINASUN TAXI", "G7 TAXI",
                            "GRAB", "BE", "XANH SM"]),
                  size=self.cfg.base_font_size + 3, bold=True, align="center")
        self.line("HÓA ĐƠN CƯỚC", align="center")
        self.separator()
        plate = (f"{self.rng.randint(10, 99)}"
                 f"{c.choice(['A', 'B', 'H', 'K'])}-{self.rng.randint(100, 999)}."
                 f"{self.rng.randint(10, 99)}")
        self.two_col_line("Xe:", plate)
        self.two_col_line("Tài xế:", f"TX{self.rng.randint(100, 9999)}")
        self.two_col_line("Ngày:", c.datetime_str())
        self.separator()
        km = self.rng.randint(10, 450) / 10
        wait_min = self.rng.randint(0, 30)
        base = 15000
        per_km = self.rng.randint(11, 18) * 1000
        fare = base + int(km * per_km)
        self.two_col_line("Quãng đường:", f"{km:.1f} km")
        self.two_col_line("Thời gian chờ:", f"{wait_min} phút")
        self.two_col_line("Giá mở cửa:", c.money(base))
        self.two_col_line("Cước km:", c.money(int(km * per_km)))
        self.separator()
        self.two_col_line("TỔNG:", c.money(fare), bold=True,
                          size=self.cfg.base_font_size + 2)
        self.footer_block()
