"""Detection dataset: JSON polygon annotations -> DBNet GT maps.

Equivalent of `src/det/dataloader.py:27-362`: per sample, read
``N.json`` (``{"annotations": [{"text", "polygon"}]}``) + ``N.jpg|png``,
apply keypoint-aware augmentation (train only), generate gt/mask/
thresh_map/thresh_mask at native resolution via the C++ runtime
(threshold maps skipped outside training, the reference's own
optimization at `dataloader.py:347-350`), then aspect-preserving resize +
zero pad to the square ``image_size``. Corrupt samples degrade to a
fully-masked blank (`dataloader.py:288-297`).

Arrays are NHWC float32; maps are (H, W, 1).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from ocr_vi_invoice_tpu import native
from ocr_vi_invoice_tpu.data.augment import DetAugment

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)
# uint8 -> normalized float in one 256-entry gather per channel: the naive
# `(img/255 - mean)/std` broadcast is ~36 ms at 960² on this host (numpy
# can't vectorize the trailing-3 broadcast); the LUT is ~8 ms.
_NORM_LUT = (np.arange(256, dtype=np.float32)[None, :] / 255.0
             - _MEAN[:, None]) / _STD[:, None]  # (3, 256)


class DetectionDataset:
    def __init__(
        self,
        data_dir: str,
        image_size: int = 640,
        is_training: bool = False,
        shrink_ratio: float = 0.4,
        thresh_min: float = 0.3,
        thresh_max: float = 0.7,
        seed: int = 0,
        uint8_transfer: bool = False,
        bitpack: bool = False,
    ):
        """``uint8_transfer=True`` emits uint8 image/maps (thresh_map
        quantized x255): 4x smaller host->device payloads — on this dev
        harness's TPU relay the f32 batch (103 MB at 960/bs4) costs
        ~3.4 s/step, dwarfing the 0.8 s compute. The jitted train/eval
        steps dequantize+normalize on device (`train/steps.py:prep`).

        ``bitpack=True`` (requires uint8_transfer, size % 8 == 0)
        additionally packs the three BINARY maps (gt/mask/thresh_mask) to
        1 bit/px along the width axis — (S, S/8, 1) uint8 — unpacked
        on-device by ``prep_det_batch``. Cuts the det batch upload another
        ~38% (25.8 -> 16.2 MB at 960/bs4); besides transfer time this
        matters because the dev relay leaks host RSS per uploaded byte."""
        self.data_dir = Path(data_dir)
        self.image_size = image_size
        self.uint8_transfer = uint8_transfer
        self.bitpack = bool(bitpack and uint8_transfer and image_size % 8 == 0)
        self.is_training = is_training
        self.shrink_ratio = shrink_ratio
        self.thresh_min = thresh_min
        self.thresh_max = thresh_max
        self.samples = sorted(self.data_dir.glob("*.json"))
        self.augment = DetAugment(seed=seed) if is_training else None
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Vary deterministic per-sample augmentation across epochs
        (called by ``data.loader.iterate``)."""
        self._epoch = int(epoch)

    def __len__(self) -> int:
        return len(self.samples)

    def _blank(self) -> Dict[str, np.ndarray]:
        s = self.image_size
        dt = np.uint8 if self.uint8_transfer else np.float32
        w = s // 8 if self.bitpack else s
        return {
            "image": np.zeros((s, s, 3), dt),
            "gt": np.zeros((s, w, 1), dt),
            "mask": np.zeros((s, w, 1), dt),
            "thresh_map": np.zeros((s, s, 1), dt),
            "thresh_mask": np.zeros((s, w, 1), dt),
        }

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        try:
            return self._load(idx)
        except Exception as e:  # corrupt data -> masked blank
            print(f"Warning: failed to load sample {idx}: {e}; returning blank.")
            return self._blank()

    def _load(self, idx: int) -> Dict[str, np.ndarray]:
        json_path = self.samples[idx]
        with open(json_path, "r", encoding="utf-8") as f:
            annotation = json.load(f)

        image = None
        for ext in (".jpg", ".png", ".jpeg"):
            p = json_path.with_suffix(ext)
            if p.exists():
                image = cv2.imread(str(p))
                if image is not None:
                    break
        if image is None:
            raise ValueError(f"cannot read image for {json_path.name}")
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)

        polygons: List[np.ndarray] = []
        for ann in annotation.get("annotations", []):
            poly = np.asarray(ann["polygon"], np.float32)
            if len(poly) >= 3:
                polygons.append(poly)

        if self.is_training and polygons and self.augment is not None:
            # Deterministic in (seed, epoch, idx): identical batches and
            # augmentations regardless of loader threading or device count.
            rng = np.random.RandomState(
                (self.seed * 9_973 + self._epoch * 1_000_003 + idx) % (2**31)
            )
            image, polygons = self.augment(image, polygons, rng=rng)
            polygons = [p for p in polygons if len(p) >= 3]

        h, w = image.shape[:2]
        gt, mask, tm, tk = native.det_gt_maps(
            polygons, h, w, self.shrink_ratio, self.thresh_min, self.thresh_max,
            is_training=self.is_training,
        )

        image_t, maps = _resize_pad(image, [gt, mask, tm, tk], self.image_size,
                                    uint8=self.uint8_transfer)
        gt, mask, tm, tk = maps
        if self.bitpack:  # binary maps -> 1 bit/px (big-endian bit order)
            gt, mask, tk = (np.packbits(m > 127, axis=1) for m in (gt, mask, tk))
        return {
            "image": image_t,
            "gt": gt[..., None],
            "mask": mask[..., None],
            "thresh_map": tm[..., None],
            "thresh_mask": tk[..., None],
        }


def _resize_pad(
    image: np.ndarray, masks: List[np.ndarray], size: int, uint8: bool = False
) -> Tuple[np.ndarray, List[np.ndarray]]:
    h, w = image.shape[:2]
    scale = size / max(h, w)
    nh, nw = int(h * scale), int(w * scale)
    if scale != 1.0:
        image = cv2.resize(image, (nw, nh))
    if uint8:
        out = np.zeros((size, size, 3), np.uint8)
        out[:nh, :nw] = image if image.dtype == np.uint8 else np.clip(
            image, 0, 255).astype(np.uint8)
        out_masks = []
        for m in masks:
            if scale != 1.0:
                m = cv2.resize(m, (nw, nh), interpolation=cv2.INTER_NEAREST)
            # maps are {0,1} or [0,1]: quantize x255 (0.002 step — far
            # below the 0.3..0.7 thresh-map dynamics)
            mm = np.zeros((size, size), np.uint8)
            mm[:nh, :nw] = np.clip(m * 255.0 + 0.5, 0, 255).astype(np.uint8)
            out_masks.append(mm)
        return out, out_masks
    out = np.zeros((size, size, 3), np.float32)
    if image.dtype == np.uint8:
        for c in range(3):
            out[:nh, :nw, c] = _NORM_LUT[c][image[..., c]]
    else:  # float input (already 0..255): fall back to the arithmetic path
        out[:nh, :nw] = (image.astype(np.float32) / 255.0 - _MEAN) / _STD
    out_masks = []
    for m in masks:
        if scale != 1.0:
            m = cv2.resize(m, (nw, nh), interpolation=cv2.INTER_NEAREST)
        mm = np.zeros((size, size), np.float32)
        mm[:nh, :nw] = m
        out_masks.append(mm)
    return out, out_masks
