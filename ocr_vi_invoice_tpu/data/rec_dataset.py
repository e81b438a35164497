"""Recognition dataset: three source formats, fixed-size line crops.

Mirror of `src/rec2/dataloader.py:104-350`:
  * VietOCR paired files: ``N.jpg`` + ``N.txt`` per sample across subfolders;
  * MC-OCR annotation file: ``filename<ws>label`` lines;
  * CSV: ``labels.csv`` with ``filename,text`` columns.
Images resize to height 32 keeping aspect ratio, right-padded white to
width 256; heavy augmentation (optional, train only) runs before the
resize. Targets are encoded to a STATIC ``max_label_len`` (jit-friendly),
input_length = W/4 = 64 CTC frames.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from ocr_vi_invoice_tpu.data.augment import RecAugment
from ocr_vi_invoice_tpu.data.tokenizer import Tokenizer

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)
_NORM_LUT = (np.arange(256, dtype=np.float32)[None, :] / 255.0
             - _MEAN[:, None]) / _STD[:, None]  # (3, 256)


def load_vietocr_samples(
    data_dir: str, subfolders: Optional[Sequence[str]] = None
) -> List[Tuple[str, str]]:
    data_dir = Path(data_dir)
    samples: List[Tuple[str, str]] = []
    if subfolders is None:
        subfolders = sorted(d.name for d in data_dir.iterdir() if d.is_dir())
    for folder in subfolders:
        fp = data_dir / folder
        if not fp.exists():
            print(f"Warning: subfolder {folder} not found, skipping.")
            continue
        for img in fp.iterdir():
            if img.suffix.lower() not in {".jpg", ".jpeg", ".png"}:
                continue
            txt = img.with_suffix(".txt")
            if txt.exists():
                try:
                    label = txt.read_text(encoding="utf-8").strip()
                except Exception:
                    continue
                if label:
                    samples.append((str(img), label))
    return samples


def load_mcocr_samples(annotation_file: str, img_dir: str) -> List[Tuple[str, str]]:
    samples = []
    img_dir = Path(img_dir)
    with open(annotation_file, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if len(parts) == 2:
                fn, label = parts
                p = img_dir / fn
                if p.exists() and label.strip():
                    samples.append((str(p), label.strip()))
    return samples


def load_csv_samples(data_dir: str, labels_file: str = "labels.csv"):
    import pandas as pd

    data_dir = Path(data_dir)
    df = pd.read_csv(data_dir / labels_file, dtype=str, keep_default_na=False)
    return [
        (str(data_dir / row["filename"]), row["text"])
        for _, row in df.iterrows()
        if row["text"]
    ]


class RecognitionDataset:
    def __init__(
        self,
        samples: Sequence[Tuple[str, str]],
        img_size: Tuple[int, int] = (32, 256),
        augment: bool = False,
        max_label_len: int = 48,
        seed: int = 0,
        uint8_transfer: bool = False,
    ):
        """``uint8_transfer=True`` emits raw uint8 images (no host
        normalization): 4x smaller host->device payloads, dequantized +
        normalized inside the jitted step (`train/steps.py:prep_rec_batch`).
        Required by ``--device_augment`` (augmentation runs on device in
        [0,1] space before normalization)."""
        self.samples = list(samples)
        self.img_size = img_size
        self.tokenizer = Tokenizer()
        self.max_label_len = max_label_len
        self.transform = RecAugment(seed=seed) if augment else None
        self.seed = seed
        self.uint8_transfer = uint8_transfer
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Vary deterministic per-sample augmentation across epochs
        (called by ``data.loader.iterate``)."""
        self._epoch = int(epoch)

    def __len__(self):
        return len(self.samples)

    def resize_pad(self, image: np.ndarray) -> np.ndarray:
        th, tw = self.img_size
        h, w = image.shape[:2]
        scale = th / h
        nw = int(w * scale)
        if nw > tw:
            image = cv2.resize(image, (tw, th))
        else:
            image = cv2.resize(image, (max(nw, 1), th))
            if tw - nw > 0:
                image = cv2.copyMakeBorder(
                    image, 0, 0, 0, tw - image.shape[1], cv2.BORDER_CONSTANT,
                    value=(255, 255, 255),
                )
        if self.uint8_transfer:
            return image if image.dtype == np.uint8 else np.clip(
                image, 0, 255).astype(np.uint8)
        if image.dtype == np.uint8:
            # fused uint8 -> normalized float via per-channel LUT (the
            # broadcast arithmetic costs ~0.5 ms/sample on this host)
            out = np.empty(image.shape, np.float32)
            for c in range(3):
                out[..., c] = _NORM_LUT[c][image[..., c]]
            return out
        img = image.astype(np.float32) / 255.0
        return (img - _MEAN) / _STD

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        path, text = self.samples[idx]
        try:
            buf = np.fromfile(path, np.uint8)
            image = cv2.imdecode(buf, cv2.IMREAD_COLOR)
            if image is None:
                raise ValueError(path)
            image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        except Exception:
            image = np.full((*self.img_size, 3), 255, np.uint8)

        if self.transform is not None:
            # Deterministic in (seed, epoch, idx) — see det_dataset._load.
            rng = np.random.RandomState(
                (self.seed * 9_973 + self._epoch * 1_000_003 + idx) % (2**31)
            )
            image = self.transform(image, rng=rng)

        target = self.tokenizer.encode([text], max_len=self.max_label_len)[0]
        tlen = min(int(self.tokenizer.lengths([text])[0]), self.max_label_len)
        return {
            "image": self.resize_pad(image),
            "target": target,
            "target_length": np.int32(tlen),
            "input_length": np.int32(self.img_size[1] // 4),
            "text": text,
        }


def create_datasets(
    vietocr_dir: str = "data/vietocr",
    vietocr_subfolders: Optional[Sequence[str]] = None,
    val_annotation: str = "data/archive/text_recognition_train_data.txt",
    val_img_dir: str = "data/archive/text_recognition_mcocr_data/text_recognition_mcocr_data",
    test_annotation: Optional[str] = "data/archive/text_recognition_val_data.txt",
    test_img_dir: Optional[str] = None,
    img_size: Tuple[int, int] = (32, 256),
    augment: bool = False,
    max_label_len: int = 48,
    uint8_transfer: bool = False,
):
    """(train, val, test) RecognitionDatasets; layout parity with
    `rec2/dataloader.py:267-350` (train=VietOCR, val/test=MC-OCR).
    ``uint8_transfer`` applies to the train split only (eval batches are
    small and the f32 eval path is unchanged)."""
    test_img_dir = test_img_dir or val_img_dir
    train = RecognitionDataset(
        load_vietocr_samples(vietocr_dir, vietocr_subfolders),
        img_size, augment=augment, max_label_len=max_label_len,
        uint8_transfer=uint8_transfer,
    )
    val = RecognitionDataset(
        load_mcocr_samples(val_annotation, val_img_dir), img_size,
        max_label_len=max_label_len,
    )
    test = None
    if test_annotation and Path(test_annotation).exists():
        test = RecognitionDataset(
            load_mcocr_samples(test_annotation, test_img_dir), img_size,
            max_label_len=max_label_len,
        )
    return train, val, test
