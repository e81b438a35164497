"""Synthetic text-line generator for recognizer training.

The reference trains recognition on the external VietOCR corpus (601k
line crops) which is not redistributable with this repo. This module
manufactures VietOCR-format training pairs (``N.jpg`` + ``N.txt`` in a
subfolder) from the same content pools as the invoice layouts: shop
names, addresses, items, money, dates, plus raw VOCAB stress strings —
rendered with varied fonts/sizes/colors and degraded with the defect
photometric ops. `data/rec_dataset.py`'s VietOCR loader consumes the
output directly.

  python -m ocr_vi_invoice_tpu.generator.rec_lines -o data/rec_synth -n 100000
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path
import cv2
import numpy as np
from PIL import Image, ImageDraw

from ocr_vi_invoice_tpu.generator.content import ContentProvider
from ocr_vi_invoice_tpu.generator.defects import DefectSimulator
from ocr_vi_invoice_tpu.generator.fonts import default_fonts


def _sample_text(c: ContentProvider, rng) -> str:
    r = rng.rand()
    if r < 0.16:
        return c.item()
    if r < 0.28:
        return c.money(c.price(1, 5000))
    if r < 0.38:
        return c.shop_name()
    if r < 0.50:
        return c.address()
    if r < 0.58:
        return c.datetime_str()
    if r < 0.64:
        return c.phone()
    if r < 0.70:
        return c.choice(["Tổng cộng", "Thành tiền", "Tạm tính", "VAT (8%)",
                         "Tiền thối lại", "Cảm ơn quý khách!",
                         "HÓA ĐƠN BÁN HÀNG", "Số lượng", "Đơn giá"])
    if r < 0.78:
        qty, unit = c.quantity()
        return f"{qty} {unit} {c.item()}"
    if r < 0.88:
        return c.invoice_no()
    return c.random_vocab_text(2, 24)


ALL_ROLES = ("sans", "serif", "mono", "sans_bold", "serif_bold",
             "mono_bold")
# domain-shift holdout (generator.apply_holdout_profile analogue for
# text lines): serif family excluded from training lines, exclusive in
# the shifted eval lines
TRAIN_ROLES = ("sans", "mono", "sans_bold", "mono_bold")
SHIFTED_ROLES = ("serif", "serif_bold")


def render_line(rng, text: str, roles=ALL_ROLES) -> np.ndarray:
    """Render one line: random font/size/colors, slight padding."""
    fonts = default_fonts()
    role = roles[rng.randint(len(roles))]
    size = int(rng.randint(18, 46))
    font = fonts.get(role, size)

    tmp = Image.new("RGB", (8, 8))
    bbox = ImageDraw.Draw(tmp).textbbox((0, 0), text, font=font)
    tw, th = bbox[2] - bbox[0], bbox[3] - bbox[1]
    pad_x = int(rng.randint(2, 14))
    pad_y = int(rng.randint(2, 10))
    paper = int(rng.randint(225, 256))
    tint = np.array([paper, paper, paper]) - rng.randint(0, 18, 3)
    img = Image.new("RGB", (tw + 2 * pad_x, th + 2 * pad_y),
                    tuple(int(v) for v in tint))
    ink = tuple(int(v) for v in rng.randint(0, 80, 3))
    ImageDraw.Draw(img).text((pad_x - bbox[0], pad_y - bbox[1]), text,
                             font=font, fill=ink)
    out = np.array(img)

    # Photometric degradation (p-gated, light)
    if rng.rand() < 0.3:
        out = DefectSimulator.gaussian_noise(rng, out, (3, 15))
    if rng.rand() < 0.25:
        out = cv2.GaussianBlur(out, (3, 3), 0)
    if rng.rand() < 0.3:
        out = DefectSimulator.brightness_contrast(rng, out)
    if rng.rand() < 0.15:
        out = DefectSimulator.toner_loss(rng, out)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description="Generate synthetic rec lines")
    ap.add_argument("--output", "-o", required=True)
    ap.add_argument("--num_samples", "-n", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--per_folder", type=int, default=10000)
    ap.add_argument("--start_index", type=int, default=0)
    ap.add_argument("--holdout_profile", default="none",
                    choices=["none", "train", "shifted"],
                    help="'train': no serif-family lines; 'shifted': "
                         "serif-family lines only (unseen glyph shapes)")
    args = ap.parse_args(argv)
    roles = {"none": ALL_ROLES, "train": TRAIN_ROLES,
             "shifted": SHIFTED_ROLES}[args.holdout_profile]

    out_root = Path(args.output)
    t0 = time.time()
    made = 0
    for i in range(args.start_index, args.start_index + args.num_samples):
        rng = np.random.RandomState(args.seed + i)
        c = ContentProvider(rng)
        text = _sample_text(c, rng).strip()
        if not text:
            continue
        sub = out_root / f"part_{i // args.per_folder:03d}"
        sub.mkdir(parents=True, exist_ok=True)
        img = render_line(rng, text, roles=roles)
        cv2.imwrite(str(sub / f"{i}.jpg"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, int(rng.randint(60, 96))])
        (sub / f"{i}.txt").write_text(text, encoding="utf-8")
        made += 1

    dt = time.time() - t0
    print(f"Generated {made} line samples in {dt:.1f}s "
          f"({made / max(dt, 1e-9):.1f}/s) -> {out_root}")


if __name__ == "__main__":
    main()
