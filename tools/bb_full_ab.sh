#!/usr/bin/env bash
# Warm-vs-cold backbone A/B, round 5 (verdict item 5): two equal-budget
# det legs differing ONLY in init — cold (fresh) vs warm-started from
# weights/backbone_pretrained WITH the reference's frozen first phase
# actually exercised (freeze_epochs 1 of 2; reference two-phase recipe:
# /root/reference/src/det/train.py:205-226). Both evaluate on the
# in-distribution test split AND the shifted holdout suite, which is
# where a pretrained backbone should earn its keep.
#
# Budget: 2 epochs x 6000 invoices @640² (~15 min/leg on v5e) — the
# full-20k@960 version is ~11 chip-hours for the pair and does not fit
# a round; resolution/subset scale down, the init contrast does not.
set -u
cd "$(dirname "$0")/.."
mkdir -p reports data/bb6k
# fixed 6000-image subset of the seed-42 corpus (deterministic file set)
if [ ! -f data/bb6k/005999.jpg ] && [ ! -f data/bb6k/.done ]; then
  echo "[bb_ab] building 6k subset"
  python - <<'EOF'
import shutil
from pathlib import Path
src = Path("data/train_det")
dst = Path("data/bb6k")
n = 0
for i in range(6000):
    stem = f"{i:06d}"
    imgs = list(src.glob(stem + ".*"))
    if not imgs:
        continue
    for f in src.glob(stem + ".*"):
        t = dst / f.name
        if not t.exists():
            try:
                t.hardlink_to(f)
            except OSError:
                shutil.copy2(f, t)
    n += 1
(dst / ".done").write_text(str(n))
print("subset images:", n)
EOF
fi

common="--train_dir data/bb6k --val_dir data/val_det --test_dir data/test_det \
  --epochs 2 --batch_size 4 --lr 1e-3 --image_size 640 --log_every 100 \
  --save_every_steps 400"

echo "[bb_ab] cold leg"
timeout 3600 python -m ocr_vi_invoice_tpu.train.det $common \
  --freeze_epochs 0 --save_dir weights/bb5_cold --auto_resume
echo "[bb_ab] warm leg (frozen phase, then differential unfreeze)"
timeout 3600 python -m ocr_vi_invoice_tpu.train.det $common \
  --freeze_epochs 1 --init_backbone_from weights/backbone_pretrained \
  --save_dir weights/bb5_warm --auto_resume

for leg in bb5_cold bb5_warm; do
  for split in test_det shift_det; do
    out="reports/eval_${leg}_${split}.txt"
    echo "[bb_ab] eval $leg on $split -> $out"
    timeout 1800 python -m ocr_vi_invoice_tpu.train.evaluate det \
      --data_dir "data/$split" --model "weights/$leg/best_model" \
      --image_size 640 | tee "$out"
  done
done
echo "[bb_ab] done"
