#!/usr/bin/env bash
# Regenerate every dataset the training/eval queue needs. data/ is
# git-ignored workspace state and is wiped between rounds; generation is
# per-sample deterministic (sample i uses seed+i), so these seeds ARE the
# datasets. Round-5 note: the original round-3 val/test seeds were never
# recorded, so the 626/347 split is re-fixed here with documented seeds;
# every checkpoint (old and new) is re-evaluated on THIS regenerated
# split so all README comparisons stay matched.
#
#   bash tools/regen_datasets.sh [det|rec|all]
set -u
cd "$(dirname "$0")/.."
what=${1:-all}
log() { echo "[regen $(date -u +%H:%M:%S)] $*"; }

if [ "$what" = det ] || [ "$what" = all ]; then
  log "det eval sets (626 val / 347 test / 347 shifted)"
  python -m ocr_vi_invoice_tpu.generator.run -o data/val_det  -n 626 --seed 500000 --workers 2
  python -m ocr_vi_invoice_tpu.generator.run -o data/test_det -n 347 --seed 777    --workers 2
  python -m ocr_vi_invoice_tpu.generator.run -o data/shift_det -n 347 --seed 777000 \
      --holdout_profile shifted --workers 2
  log "det train set (the reference-scale 20k corpus, seed 42)"
  python -m ocr_vi_invoice_tpu.generator.run -o data/train_det -n 20000 --seed 42 --workers 2
fi

if [ "$what" = rec ] || [ "$what" = all ]; then
  log "rec holdout corpora (serif family excluded from train)"
  python -m ocr_vi_invoice_tpu.generator.rec_lines -o data/rec_hold_train -n 120000 \
      --seed 42 --holdout_profile train
  python -m ocr_vi_invoice_tpu.generator.rec_lines -o data/rec_hold_val -n 1500 \
      --seed 900000 --holdout_profile train
  python -m ocr_vi_invoice_tpu.generator.rec_lines -o data/rec_hold_test -n 1500 \
      --seed 910000 --holdout_profile train
  python -m ocr_vi_invoice_tpu.generator.rec_lines -o data/shift_rec -n 1300 \
      --seed 920000 --holdout_profile shifted
  python tools/make_annotation.py data/rec_hold_val data/rec_hold_test data/shift_rec
fi
log "done"
