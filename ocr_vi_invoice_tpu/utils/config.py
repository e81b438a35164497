"""Typed configuration tree.

One dataclass per subsystem, replacing the reference's scattered argparse
defaults (det train `src/det/train.py:91-103`, rec train
`src/rec2/train.py:97-125`, pipeline `src/pipeline/pipeline2.py:196-238`,
postproc `src/det/test.py:47-53`). Knob names are kept identical so users
of the reference find the same levers.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple


@dataclass
class DetModelConfig:
    backbone: str = "resnet50"
    in_channels: int = 3
    inner_channels: int = 256
    k: float = 50.0  # differentiable-binarization steepness
    dcn: bool = True  # deformable conv v2 in stages c3-c5
    pretrained: bool = False  # no torchvision weights on TPU; port or train


@dataclass
class RecModelConfig:
    variant: str = "base"  # tiny | small | base
    in_channels: int = 3
    img_size: Tuple[int, int] = (32, 256)  # H, W
    dropout: float = 0.0
    context_window: int = 3  # SGM context chars each side
    max_label_len: int = 48  # static target capacity for jit


@dataclass
class DetTrainConfig:
    epochs: int = 30
    batch_size: int = 4
    lr: float = 1e-3
    weight_decay: float = 0.05
    image_size: int = 960
    freeze_epochs: int = 5  # backbone frozen for the first N epochs
    backbone_lr_scale: float = 0.1  # after unfreeze: backbone lr = lr * scale
    unfreeze_lr_scale: float = 0.5  # overall lr scale after unfreeze
    grad_clip: float = 5.0
    # DB loss weights (alpha: dice on thresh_binary, beta: masked L1 on thresh)
    alpha: float = 5.0
    beta: float = 10.0
    ohem_ratio: float = 3.0
    shrink_ratio: float = 0.4
    thresh_min: float = 0.3
    thresh_max: float = 0.7
    max_polygons: int = 128  # static capacity for on-device GT maps
    seed: int = 42
    save_dir: str = "weights/det"
    checkpoint_every: int = 5


@dataclass
class RecTrainConfig:
    epochs: int = 20
    batch_size: int = 64
    lr: float = 6.5e-4
    weight_decay: float = 0.05
    grad_clip: float = 5.0
    lambda_sgm: float = 0.1
    augment: bool = False
    seed: int = 42
    save_dir: str = "weights/rec2"
    checkpoint_every: int = 5


@dataclass
class PostProcessConfig:
    """DB probability-map -> boxes. Defaults mirror `src/det/test.py:47-53`;
    the e2e pipeline overrides box_thresh=0.5, unclip_ratio=1.6
    (`pipeline2.py:212-215`)."""

    thresh: float = 0.3
    box_thresh: float = 0.6
    max_candidates: int = 1000
    unclip_ratio: float = 1.5
    min_size: int = 3
    min_area: float = 10.0


@dataclass
class PipelineConfig:
    det_image_size: int = 960
    rec_batch_size: int = 32
    rec_img_size: Tuple[int, int] = (32, 256)
    preprocess: bool = False  # U-2-Net document scanner
    enhance: bool = False
    max_boxes: int = 256  # static crop capacity for the fused program
    postprocess: PostProcessConfig = field(
        default_factory=lambda: PostProcessConfig(box_thresh=0.5, unclip_ratio=1.6)
    )


def replace(cfg, **kw):
    """Functional config override helper."""
    return dataclasses.replace(cfg, **kw)
