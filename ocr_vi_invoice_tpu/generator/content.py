"""Vietnamese invoice content providers.

Random-but-plausible shop names, addresses, line items, payment rows, tax
ids, datetimes and currency strings — every generated string is drawn
from characters the recognizer's VOCAB covers, mirroring how the
reference's layouts source their text from the model vocabulary
(`generator/det/layouts/base_layout.py:19,51-69`).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ocr_vi_invoice_tpu.data.vocab import VOCAB

SHOP_PREFIX = ["Cửa hàng", "Siêu thị", "Nhà hàng", "Quán", "Tạp hóa", "Công ty",
               "Cafe", "Tiệm", "Đại lý", "Trung tâm"]
SHOP_NAME = ["Minh Anh", "Thành Đạt", "Hồng Phúc", "Kim Ngân", "Phương Nam",
             "An Bình", "Tân Tiến", "Hoàng Gia", "Việt Hưng", "Bảo Châu",
             "Sài Gòn", "Hà Nội", "Đồng Xanh", "Phú Quý", "Thiên Lộc"]
STREETS = ["Lê Lợi", "Trần Hưng Đạo", "Nguyễn Huệ", "Hai Bà Trưng", "Lý Thường Kiệt",
           "Điện Biên Phủ", "Cách Mạng Tháng 8", "Võ Văn Tần", "Phan Chu Trinh",
           "Nguyễn Trãi", "Hoàng Văn Thụ", "Bạch Đằng"]
DISTRICTS = ["Quận 1", "Quận 3", "Quận 7", "Q. Bình Thạnh", "Q. Tân Bình",
             "Ba Đình", "Hoàn Kiếm", "Cầu Giấy", "Hải Châu", "Ninh Kiều"]
CITIES = ["TP. Hồ Chí Minh", "Hà Nội", "Đà Nẵng", "Cần Thơ", "Hải Phòng", "Huế"]
ITEMS = ["Cà phê sữa đá", "Trà đào cam sả", "Bánh mì thịt", "Phở bò tái",
         "Cơm gà xối mỡ", "Bún chả", "Nước suối", "Coca Cola", "Bia Sài Gòn",
         "Sữa tươi Vinamilk", "Gạo ST25 5kg", "Trứng gà (10 quả)", "Thịt ba chỉ",
         "Rau muống", "Cá basa phi lê", "Mì Hảo Hảo", "Dầu ăn Tường An",
         "Nước mắm Nam Ngư", "Đường trắng 1kg", "Bột giặt Omo", "Giấy vệ sinh",
         "Khăn giấy", "Bàn chải P/S", "Kem đánh răng", "Xà phòng Lifebuoy",
         "Trà xanh 0 độ", "Sting dâu", "Bánh Oreo", "Kẹo Alpenliebe",
         "Thuốc lá Vinataba", "Khẩu trang y tế", "Pin AA Panasonic"]
UNITS = ["cái", "hộp", "chai", "gói", "kg", "ly", "phần", "lon", "túi", "thùng"]
PAY_LABELS = ["Tổng cộng", "Thành tiền", "Tạm tính", "Giảm giá", "VAT (8%)",
              "VAT (10%)", "Tiền khách đưa", "Tiền thối lại", "Đã thanh toán"]
HEADERS = ["HÓA ĐƠN BÁN HÀNG", "HÓA ĐƠN THANH TOÁN", "PHIẾU THANH TOÁN",
           "HÓA ĐƠN BÁN LẺ", "BIÊN LAI", "HÓA ĐƠN GTGT", "PHIẾU TÍNH TIỀN"]
FOOTERS = ["Cảm ơn quý khách!", "Hẹn gặp lại!", "Xin cảm ơn & hẹn gặp lại",
           "Cảm ơn quý khách. Hẹn gặp lại!", "Wifi: matkhau123",
           "Giữ hóa đơn để đổi trả trong 7 ngày"]


class ContentProvider:
    def __init__(self, rng: np.random.RandomState):
        self.rng = rng

    def choice(self, seq):
        return seq[self.rng.randint(len(seq))]

    def shop_name(self) -> str:
        return f"{self.choice(SHOP_PREFIX)} {self.choice(SHOP_NAME)}"

    def address(self) -> str:
        return (f"{self.rng.randint(1, 400)} {self.choice(STREETS)}, "
                f"{self.choice(DISTRICTS)}, {self.choice(CITIES)}")

    def phone(self) -> str:
        return f"0{self.rng.randint(3, 10)}{self.rng.randint(10**7, 10**8 - 1)}"

    def tax_id(self) -> str:
        return f"MST: {self.rng.randint(10**9, 10**10 - 1)}"

    def datetime_str(self) -> str:
        return (f"{self.rng.randint(1, 29):02d}/{self.rng.randint(1, 13):02d}/"
                f"20{self.rng.randint(18, 27)} "
                f"{self.rng.randint(0, 24):02d}:{self.rng.randint(0, 60):02d}")

    def invoice_no(self) -> str:
        style = self.rng.randint(3)
        n = self.rng.randint(1, 10**6)
        if style == 0:
            return f"Số HĐ: {n:06d}"
        if style == 1:
            return f"#{n:06d}"
        return f"No: INV-{n:05d}"

    def price(self, lo: int = 5, hi: int = 500) -> int:
        return int(self.rng.randint(lo, hi)) * 1000

    def money(self, amount: int) -> str:
        """Currency formatting styles (base_layout.py:211-225 analogue)."""
        s = f"{amount:,}".replace(",", ".")
        style = self.rng.randint(4)
        if style == 0:
            return f"{s}đ" if "đ" in VOCAB else s
        if style == 1:
            return f"{s} ₫"
        if style == 2:
            return f"{s} VND"
        return s

    def item(self) -> str:
        return self.choice(ITEMS)

    def quantity(self) -> Tuple[int, str]:
        return int(self.rng.randint(1, 10)), self.choice(UNITS)

    def header(self) -> str:
        return self.choice(HEADERS)

    def footer(self) -> str:
        return self.choice(FOOTERS)

    def random_vocab_text(self, min_len: int = 3, max_len: int = 18) -> str:
        """Arbitrary VOCAB-sampled string (stress content, matching the
        reference's random-text helpers drawing from the model vocab)."""
        n = self.rng.randint(min_len, max_len + 1)
        chars = [VOCAB[self.rng.randint(len(VOCAB))] for _ in range(n)]
        return "".join(chars).strip() or "a"

    def line_items(self, n: int) -> List[Tuple[str, int, str, int, int]]:
        """(name, qty, unit, unit_price, total) rows."""
        rows = []
        for _ in range(n):
            name = self.item()
            qty, unit = self.quantity()
            price = self.price()
            rows.append((name, qty, unit, price, qty * price))
        return rows
