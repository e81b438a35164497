#!/bin/bash
# Warm-vs-cold backbone experiment (round-3 verdict item 8):
# two identical short det legs on a fixed 1000-image subset at 512²,
# differing ONLY in init — fresh (cold) vs backbone warm-started from
# the best shipped det checkpoint (the TPU-side analogue of the
# reference's ImageNet-pretrained ResNet50 init).
cd /root/repo
set -x
timeout 2800 python -m ocr_vi_invoice_tpu.train.det \
  --train_dir data/bb_subset --val_dir data/val_det --test_dir "" \
  --epochs 2 --freeze_epochs 0 --batch_size 4 --lr 1e-3 --image_size 512 \
  --dcn_mode gather --save_dir weights/bb_cold --log_every 50
timeout 2800 python -m ocr_vi_invoice_tpu.train.det \
  --train_dir data/bb_subset --val_dir data/val_det --test_dir "" \
  --epochs 2 --freeze_epochs 0 --batch_size 4 --lr 1e-3 --image_size 512 \
  --dcn_mode gather --save_dir weights/bb_warm \
  --init_backbone_from weights/det960b/best_model
echo "=== cold ==="; cat weights/bb_cold/training_log.csv
echo "=== warm ==="; cat weights/bb_warm/training_log.csv
