#!/usr/bin/env bash
# Round-5 chip work after the det960d leg, reprioritized per the round-4
# verdict (warm-backbone A/B outranks the full-size U-2-Net leg):
#   1 rec holdout leg  2 full-set evals  3 warm/cold backbone A/B
#   4 DCN bound table + det profile  5 u2net leg (time permitting)
set -u
cd "$(dirname "$0")/.."
mkdir -p reports
log() { echo "[post-det $(date -u +%H:%M:%S)] $*"; }
stage=${1:-1}

if [ "$stage" -le 1 ]; then
  log "rec holdout leg"
  python -m ocr_vi_invoice_tpu.train.supervisor \
    --rss_limit_gb 55 --max_restarts 20 --stall_minutes 30 -- \
    python -m ocr_vi_invoice_tpu.train.rec \
      --vietocr_dir data/rec_hold_train \
      --val_annotation data/rec_hold_val/annotation.txt \
      --val_img_dir data/rec_hold_val \
      --test_annotation data/rec_hold_test/annotation.txt \
      --test_img_dir data/rec_hold_test \
      --epochs 2 --batch_size 256 --variant base \
      --device_augment --save_every_steps 200 \
      --save_dir weights/rec_hold --auto_resume
  rc=$?
  log "rec leg rc=$rc"
  [ "$rc" -eq 75 ] && { log "device wedged — stopping"; exit 75; }
fi

if [ "$stage" -le 2 ]; then
  log "full-set evals (regenerated 626/347 split, seeds in regen_datasets.sh)"
  for det in det960b det960d; do
    [ -d "weights/$det/best_model" ] || continue
    for split in test_det shift_det; do
      out="reports/eval_${det}_${split}.txt"
      log "  det $det on $split -> $out"
      timeout 2400 python -m ocr_vi_invoice_tpu.train.evaluate det \
        --data_dir "data/$split" --model "weights/$det/best_model" \
        | tee "$out"
    done
  done
  if [ -d weights/rec_hold/best_model ]; then
    for split in rec_hold_test shift_rec; do
      out="reports/eval_rec_hold_${split}.txt"
      log "  rec holdout on $split -> $out"
      timeout 2400 python -m ocr_vi_invoice_tpu.train.evaluate rec \
        --annotation "data/$split/annotation.txt" --img_dir "data/$split" \
        --model weights/rec_hold/best_model | tee "$out"
    done
    # the all-families model on the same shifted slice, for the table
    timeout 2400 python -m ocr_vi_invoice_tpu.train.evaluate rec \
      --annotation data/shift_rec/annotation.txt --img_dir data/shift_rec \
      --model weights/rec2_aug2/best_model \
      | tee reports/eval_rec2_aug2_shift_rec.txt
  fi
fi

if [ "$stage" -le 3 ]; then
  log "warm/cold backbone A/B"
  bash tools/bb_full_ab.sh
fi

if [ "$stage" -le 4 ]; then
  log "DCN bound table + det profile"
  timeout 3900 python tools/dcn_bound_table.py \
    > reports/dcn_bound_table.json 2> reports/dcn_bound_table.err || true
  timeout 2400 python tools/profile_det.py \
    > reports/profile_det.json 2> reports/profile_det.err || true
fi

if [ "$stage" -le 5 ]; then
  log "full-size U-2-Net leg + corner gates"
  python -m ocr_vi_invoice_tpu.train.supervisor \
    --rss_limit_gb 55 --max_restarts 10 --stall_minutes 30 -- \
    python -m ocr_vi_invoice_tpu.train.scan --variant u2net \
      --steps 1500 --save_dir weights/u2net
  rc=$?
  log "u2net rc=$rc"
  if [ "$rc" -ne 75 ] && [ -d weights/u2net/best_model ]; then
    timeout 1800 python -m ocr_vi_invoice_tpu.train.scan --variant u2net \
      --save_dir weights/u2net --eval_corners 64 \
      | tee reports/corner_gate_u2net.txt || true
    timeout 1800 python -m ocr_vi_invoice_tpu.train.scan --variant u2netp \
      --save_dir weights/u2netp --eval_corners 64 \
      | tee reports/corner_gate_u2netp.txt || true
  fi
fi
log "post-det queue complete"
