"""Synthetic invoice generation orchestrator.

Parity with `generator/det/generator.py:27-306`: 9 scenarios mapped to
``GenerationConfig`` (class ratios, JPEG quality band, defect level,
layout weights), sample classes realistic / edge-case / blank /
unreadable, JPEG+JSON output with ``annotations: [{text, polygon}]``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from ocr_vi_invoice_tpu.generator.defects import (
    DefectSimulator,
    apply_defects_heavy,
    apply_defects_light,
    apply_defects_medium,
)
from ocr_vi_invoice_tpu.generator.edge_cases import (
    apply_random_edge_case,
    blank_page,
)
from ocr_vi_invoice_tpu.generator.layouts import WEIGHTS, LayoutFactory


class GenerationScenario(Enum):
    CLEAN = "clean"
    SCANNED = "scanned"
    PHOTO = "photo"
    DEGRADED = "degraded"
    THERMAL_HEAVY = "thermal_heavy"
    FORMAL_HEAVY = "formal_heavy"
    EDGE_HEAVY = "edge_heavy"
    NEGATIVE_HEAVY = "negative_heavy"
    MIXED = "mixed"


@dataclass
class GenerationConfig:
    realistic_ratio: float = 0.5
    edge_case_ratio: float = 0.35
    blank_ratio: float = 0.08
    unreadable_ratio: float = 0.07
    jpeg_quality: Tuple[int, int] = (40, 95)
    defect_level: str = "medium"  # none | light | medium | heavy
    layout_weights: Dict[str, float] = field(default_factory=lambda: dict(WEIGHTS))
    # Font-role indirection (e.g. {"serif": "sans"}) — see
    # `apply_holdout_profile`; None keeps the layouts' native roles.
    font_remap: Optional[Dict[str, str]] = None


# ---- domain-shift holdout (an honest stand-in for the real-data gates
# this zero-egress environment cannot run: SROIE / MC-OCR) -------------- #
#
# Two layouts, one font family, and one defect regime are held out of
# training-data generation; the complementary 'shifted' profile generates
# ONLY from that held-out slice. Reporting metrics on both bounds the
# synthetic-overfit gap that same-generator train/test numbers hide.
HOLDOUT_LAYOUTS = ("handwritten", "taxi_receipt")
HOLDOUT_FONT_ROLES = ("serif", "serif_bold")  # the DejaVu Serif family
HOLDOUT_DEFECT_LEVEL = "heavy"


def apply_holdout_profile(cfg: "GenerationConfig",
                          profile: Optional[str]) -> "GenerationConfig":
    """Mutate ``cfg`` for a holdout profile and return it.

    'train':   exclude the held-out layouts, render serif roles with the
               sans family, cap defects below the held-out regime.
    'shifted': generate ONLY the held-out layouts, render sans/mono roles
               with the serif family, use the held-out defect regime.
    """
    if profile in (None, "none"):
        return cfg
    if profile == "train":
        for k in HOLDOUT_LAYOUTS:
            cfg.layout_weights[k] = 0.0
        cfg.font_remap = {"serif": "sans", "serif_bold": "sans_bold"}
        if cfg.defect_level == HOLDOUT_DEFECT_LEVEL:
            cfg.defect_level = "medium"
    elif profile == "shifted":
        cfg.layout_weights = {
            k: (1.0 if k in HOLDOUT_LAYOUTS else 0.0)
            for k in cfg.layout_weights
        }
        cfg.font_remap = {"sans": "serif", "sans_bold": "serif_bold",
                          "mono": "serif", "mono_bold": "serif_bold"}
        cfg.defect_level = HOLDOUT_DEFECT_LEVEL
    else:
        raise ValueError(f"unknown holdout profile: {profile!r}")
    return cfg


def get_scenario_config(scenario: GenerationScenario) -> GenerationConfig:
    c = GenerationConfig()
    if scenario == GenerationScenario.CLEAN:
        c.defect_level = "none"
        c.realistic_ratio, c.edge_case_ratio = 0.9, 0.05
        c.blank_ratio = c.unreadable_ratio = 0.025
        c.jpeg_quality = (80, 95)
    elif scenario == GenerationScenario.SCANNED:
        c.defect_level = "light"
        c.jpeg_quality = (70, 95)
    elif scenario == GenerationScenario.PHOTO:
        c.defect_level = "medium"
        c.jpeg_quality = (50, 90)
    elif scenario == GenerationScenario.DEGRADED:
        c.defect_level = "heavy"
        c.jpeg_quality = (40, 75)
    elif scenario == GenerationScenario.THERMAL_HEAVY:
        for k in c.layout_weights:
            c.layout_weights[k] *= 0.3
        for k in ("supermarket_thermal", "cafe_minimal", "modern_pos",
                  "taxi_receipt"):
            c.layout_weights[k] = 0.2
    elif scenario == GenerationScenario.FORMAL_HEAVY:
        for k in c.layout_weights:
            c.layout_weights[k] *= 0.3
        for k in ("formal_vat", "utility_bill", "hotel_bill"):
            c.layout_weights[k] = 0.25
    elif scenario == GenerationScenario.EDGE_HEAVY:
        c.realistic_ratio, c.edge_case_ratio = 0.25, 0.65
        c.blank_ratio = c.unreadable_ratio = 0.05
    elif scenario == GenerationScenario.NEGATIVE_HEAVY:
        c.realistic_ratio, c.edge_case_ratio = 0.3, 0.2
        c.blank_ratio, c.unreadable_ratio = 0.25, 0.25
    return c


class SyntheticInvoiceGenerator:
    def __init__(self, config: Optional[GenerationConfig] = None,
                 seed: Optional[int] = None):
        self.config = config or GenerationConfig()
        self.rng = np.random.RandomState(seed)
        if self.config.font_remap:
            from ocr_vi_invoice_tpu.generator.fonts import (
                RemappedFonts,
                default_fonts,
            )

            self.fonts = RemappedFonts(default_fonts(),
                                       self.config.font_remap)
        else:
            self.fonts = None  # layouts fall back to default_fonts()

    @classmethod
    def from_scenario(cls, scenario: GenerationScenario,
                      seed: Optional[int] = None) -> "SyntheticInvoiceGenerator":
        return cls(get_scenario_config(scenario), seed)

    # ---------------------------------------------------------------- #

    def _apply_defects(self, img: np.ndarray) -> np.ndarray:
        level = self.config.defect_level
        if level == "light":
            return apply_defects_light(self.rng, img)
        if level == "medium":
            return apply_defects_medium(self.rng, img)
        if level == "heavy":
            return apply_defects_heavy(self.rng, img)
        return img

    def generate_realistic(self) -> Tuple[np.ndarray, List[Dict], str]:
        layout = LayoutFactory.create_random(self.rng, self.config.layout_weights, fonts=self.fonts)
        img, anns = layout.generate()
        img = self._apply_defects(img)
        return img, anns, "realistic"

    def generate_edge_case(self) -> Tuple[np.ndarray, List[Dict], str]:
        layout = LayoutFactory.create_random(self.rng, self.config.layout_weights, fonts=self.fonts)
        img, anns = layout.generate()
        img, anns = apply_random_edge_case(self.rng, img, anns)
        img = self._apply_defects(img)
        return img, anns, "edge_case"

    def generate_blank(self) -> Tuple[np.ndarray, List[Dict], str]:
        img, anns = blank_page(self.rng)
        if self.config.defect_level != "none":
            img = apply_defects_light(self.rng, img)
        return img, anns, "blank"

    def generate_unreadable(self) -> Tuple[np.ndarray, List[Dict], str]:
        """Destroyed document: text exists but is illegible — labeled with
        NO annotations so the detector learns to ignore it."""
        layout = LayoutFactory.create_random(self.rng, self.config.layout_weights, fonts=self.fonts)
        img, _ = layout.generate()
        # stack heavy destruction until unreadable
        img = cv2.GaussianBlur(img, (0, 0), self.rng.uniform(4, 9))
        img = DefectSimulator.toner_loss(self.rng, img)
        img = apply_defects_heavy(self.rng, img)
        return img, [], "unreadable"

    def generate_sample(self) -> Tuple[np.ndarray, List[Dict], str]:
        c = self.config
        r = self.rng.rand()
        if r < c.blank_ratio:
            return self.generate_blank()
        if r < c.blank_ratio + c.unreadable_ratio:
            return self.generate_unreadable()
        if r < c.blank_ratio + c.unreadable_ratio + c.edge_case_ratio:
            return self.generate_edge_case()
        return self.generate_realistic()

    # ---------------------------------------------------------------- #

    def save_sample(self, out_dir: Path, stem: str, img: np.ndarray,
                    annotations: List[Dict], kind: str) -> None:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        q = int(self.rng.randint(*self.config.jpeg_quality))
        cv2.imwrite(str(out_dir / f"{stem}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, q])
        payload = {
            "kind": kind,
            "width": int(img.shape[1]),
            "height": int(img.shape[0]),
            "annotations": [
                {"text": a["text"],
                 "polygon": [[float(x), float(y)] for x, y in a["polygon"]]}
                for a in annotations
            ],
        }
        with open(out_dir / f"{stem}.json", "w", encoding="utf-8") as f:
            json.dump(payload, f, ensure_ascii=False)
