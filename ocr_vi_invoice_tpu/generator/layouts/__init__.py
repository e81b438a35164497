"""The 12 invoice layout families + weighted factory.

Capability parity with `generator/det/layouts/` (12 classes, factory and
sampling weights at `layouts/__init__.py:35-91`), organized here by
family: thermal (narrow mono receipts), formal (wide bordered documents),
receipt (medium mixed), handwritten.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Type

import numpy as np

from ocr_vi_invoice_tpu.generator.base_layout import BaseLayout
from ocr_vi_invoice_tpu.generator.layouts.thermal import (
    SupermarketThermal,
    CafeMinimal,
    ModernPOS,
    TraditionalMarket,
)
from ocr_vi_invoice_tpu.generator.layouts.formal import (
    FormalVAT,
    UtilityBill,
    HotelBill,
)
from ocr_vi_invoice_tpu.generator.layouts.receipt import (
    RestaurantBill,
    DeliveryReceipt,
    EcommerceReceipt,
    TaxiReceipt,
)
from ocr_vi_invoice_tpu.generator.layouts.handwritten import Handwritten

LAYOUTS: Dict[str, Type[BaseLayout]] = {
    "supermarket_thermal": SupermarketThermal,
    "cafe_minimal": CafeMinimal,
    "modern_pos": ModernPOS,
    "traditional_market": TraditionalMarket,
    "formal_vat": FormalVAT,
    "utility_bill": UtilityBill,
    "hotel_bill": HotelBill,
    "restaurant_bill": RestaurantBill,
    "delivery_receipt": DeliveryReceipt,
    "ecommerce_receipt": EcommerceReceipt,
    "taxi_receipt": TaxiReceipt,
    "handwritten": Handwritten,
}

# Sampling weights: everyday receipt types dominate, like real invoice
# corpora; formal/rare documents get smaller shares.
WEIGHTS: Dict[str, float] = {
    "supermarket_thermal": 0.14,
    "cafe_minimal": 0.10,
    "modern_pos": 0.12,
    "traditional_market": 0.06,
    "formal_vat": 0.10,
    "utility_bill": 0.06,
    "hotel_bill": 0.05,
    "restaurant_bill": 0.12,
    "delivery_receipt": 0.08,
    "ecommerce_receipt": 0.08,
    "taxi_receipt": 0.04,
    "handwritten": 0.05,
}


class LayoutFactory:
    @staticmethod
    def create(name: str, rng: np.random.RandomState,
               fonts=None) -> BaseLayout:
        return LAYOUTS[name](rng, fonts=fonts)

    @staticmethod
    def create_random(
        rng: np.random.RandomState,
        weights: Optional[Dict[str, float]] = None,
        fonts=None,
    ) -> BaseLayout:
        w = weights or WEIGHTS
        names = list(w.keys())
        probs = np.asarray([w[n] for n in names], np.float64)
        probs /= probs.sum()
        name = names[rng.choice(len(names), p=probs)]
        return LayoutFactory.create(name, rng, fonts=fonts)

    @staticmethod
    def names() -> List[str]:
        return list(LAYOUTS.keys())
