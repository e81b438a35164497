"""Extract the ResNet50(+DCN) backbone from a detection checkpoint into
a reusable pretrained-backbone artifact.

The reference starts detection training from an ImageNet-pretrained
torchvision ResNet50 (`/root/reference/model/det/backbone.py:13-18`).
This zero-egress environment has no ImageNet weights, so the equivalent
reusable artifact is a backbone trained on the synthetic corpus itself
(the round-3 warm-vs-cold A/B measured +0.19 F1 at equal budget from
such a backbone). The exported artifact contains ONLY the backbone
subtrees — a future `train.det` leg warm-starts from it via
``--init_backbone_from`` (and picks `weights/backbone_pretrained` up
automatically when starting fresh), then optionally freezes it for the
reference's phase-1 recipe (`src/det/train.py:138-178`).

  python tools/export_backbone.py weights/det960b/best_model
  python tools/export_backbone.py <src_ckpt> <dst_dir> --force
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None):
    ap = argparse.ArgumentParser(description="Export a det backbone artifact")
    ap.add_argument("src", help="det checkpoint dir (e.g. weights/det960b/best_model)")
    ap.add_argument("dst", nargs="?", default="weights/backbone_pretrained")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args(argv)

    import orbax.checkpoint as ocp

    from ocr_vi_invoice_tpu.train.checkpoint import load_weights

    restored = load_weights(args.src)
    payload = {
        "params": {"backbone": restored["params"]["backbone"]},
        "batch_stats": {"backbone": restored["batch_stats"]["backbone"]},
    }

    dst = Path(args.dst).absolute()
    if dst.exists():
        if not args.force:
            sys.exit(f"{dst} exists; pass --force to overwrite")
        shutil.rmtree(dst)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(dst, payload)
    ckptr.wait_until_finished()  # orbax saves async; block before exit
    meta = {
        "kind": "backbone_pretrained",
        "source": str(args.src),
        "dcn_mode": restored.get("dcn_mode"),
        "epoch": restored.get("epoch"),
        "best_metric": restored.get("best_metric"),
    }
    with open(dst / "meta.json", "w") as f:
        json.dump(meta, f, indent=1)
    n = sum(x.size for x in __import__("jax").tree_util.tree_leaves(
        payload["params"]))
    print(f"Exported backbone ({n:,} params) from {args.src} -> {dst}")


if __name__ == "__main__":
    main()
