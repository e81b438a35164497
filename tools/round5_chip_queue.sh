#!/usr/bin/env bash
# Scripted chip-work queue (round-4 verdict item 4c): when the TPU tunnel
# is healthy — or comes back after an outage — run the chip-blocked work
# in priority order, unattended. Every stage is supervised/kill-safe and
# leaves resumable state, so re-running the script after any interruption
# continues where it left off.
#
#   bash tools/round5_chip_queue.sh [start_stage]
#
# Stages:
#   1  det960d converged leg (resume 3-epoch OneCycle from last_state)
#   2  rec holdout leg (serif family never seen in training)
#   3  full-set evals: det in-dist + shifted for det960b and det960d;
#      rec holdout-trained on rec_hold_test (in-dist) + shift_rec
#   4  DCN bound table (all 6 shapes incl. stride-2) + det profile
#   5  bench.py sanity run (the driver runs its own at round end)
#
# Exit rc 75 anywhere = the supervisor detected a wedged device; the
# queue stops rather than stacking more wedged clients on a jammed relay
# (round-4 incident: restart uploads worsened the jam).
set -u
cd "$(dirname "$0")/.."
mkdir -p reports
log() { echo "[queue $(date -u +%H:%M:%S)] $*"; }

stage=${1:-1}

if [ "$stage" -le 0 ]; then
  log "stage 0: dataset presence check (regenerate via tools/regen_datasets.sh)"
  for d in data/train_det data/val_det data/test_det; do
    [ -d "$d" ] || { log "missing $d — run tools/regen_datasets.sh det"; exit 2; }
  done
fi

if [ "$stage" -le 1 ]; then
  log "stage 1: det960d converged leg (fresh 3-epoch OneCycle from the"
  log "  step-3000 extraction — the round-4 last_state died with the workspace)"
  python -m ocr_vi_invoice_tpu.train.supervisor \
    --rss_limit_gb 55 --max_restarts 50 --stall_minutes 50 -- \
    python -m ocr_vi_invoice_tpu.train.det \
      --train_dir data/train_det --val_dir data/val_det \
      --test_dir data/test_det --epochs 3 --freeze_epochs 0 \
      --batch_size 4 --lr 2.5e-4 --image_size 960 \
      --save_dir weights/det960d --resume weights/det960d_s3000/best_model \
      --save_every_steps 500 --auto_resume
  rc=$?
  log "stage 1 rc=$rc"
  [ "$rc" -eq 75 ] && { log "device wedged — stopping queue"; exit 75; }
fi

if [ "$stage" -le 2 ]; then
  log "stage 2: rec holdout leg"
  python -m ocr_vi_invoice_tpu.train.supervisor \
    --rss_limit_gb 55 --max_restarts 20 --stall_minutes 50 -- \
    python -m ocr_vi_invoice_tpu.train.rec \
      --vietocr_dir data/rec_hold_train \
      --val_annotation data/rec_hold_val/annotation.txt \
      --val_img_dir data/rec_hold_val \
      --test_annotation data/rec_hold_test/annotation.txt \
      --test_img_dir data/rec_hold_test \
      --epochs 2 --batch_size 256 --variant base \
      --device_augment --save_every_steps 200 \
      --save_dir weights/rec_hold
  rc=$?
  log "stage 2 rc=$rc"
  [ "$rc" -eq 75 ] && { log "device wedged — stopping queue"; exit 75; }
fi

if [ "$stage" -le 3 ]; then
  log "stage 3: full-set evals"
  for det in det960b det960d; do
    [ -d "weights/$det/best_model" ] || continue
    for split in test_det shift_det; do
      out="reports/eval_${det}_${split}.txt"
      log "  det $det on $split -> $out"
      timeout 3600 python -m ocr_vi_invoice_tpu.train.evaluate det \
        --data_dir "data/$split" --model "weights/$det/best_model" \
        | tee "$out"
    done
  done
  if [ -d weights/rec_hold/best_model ]; then
    for split in rec_hold_test shift_rec; do
      out="reports/eval_rec_hold_${split}.txt"
      log "  rec holdout on $split -> $out"
      timeout 3600 python -m ocr_vi_invoice_tpu.train.evaluate rec \
        --annotation "data/$split/annotation.txt" --img_dir "data/$split" \
        --model weights/rec_hold/best_model | tee "$out"
    done
  fi
fi

if [ "$stage" -le 4 ]; then
  log "stage 4: DCN bound table + det profile"
  timeout 3900 python tools/dcn_bound_table.py \
    > reports/dcn_bound_table.json 2> reports/dcn_bound_table.err || true
  timeout 3300 python tools/profile_det.py \
    > reports/profile_det.json 2> reports/profile_det.err || true
fi

if [ "$stage" -le 5 ]; then
  log "stage 5: full-size U-2-Net leg + corner gates (r4 verdict item 8)"
  python -m ocr_vi_invoice_tpu.train.supervisor \
    --rss_limit_gb 55 --max_restarts 10 --stall_minutes 50 -- \
    python -m ocr_vi_invoice_tpu.train.scan --variant u2net \
      --steps 2000 --save_dir weights/u2net
  rc=$?
  log "stage 5 rc=$rc"
  if [ "$rc" -ne 75 ] && [ -d weights/u2net/best_model ]; then
    timeout 1800 python -m ocr_vi_invoice_tpu.train.scan --variant u2net \
      --save_dir weights/u2net --eval_corners 64 \
      | tee reports/corner_gate_u2net.txt || true
    timeout 1800 python -m ocr_vi_invoice_tpu.train.scan --variant u2netp \
      --save_dir weights/u2netp --eval_corners 64 \
      | tee reports/corner_gate_u2netp.txt || true
  fi
fi

if [ "$stage" -le 6 ]; then
  log "stage 6: bench sanity"
  timeout 2700 python bench.py | tee reports/bench_selfrun.json || true
fi

log "queue complete"
