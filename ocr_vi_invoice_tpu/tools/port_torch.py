"""Port PyTorch reference checkpoints to this framework's flax trees.

Accepts the reference's ``.pth`` layouts (wrapped ``model_state_dict``
dicts, stray ``module.`` DataParallel prefixes — `pipeline2.py:46-52`)
and emits ``{"params": ..., "batch_stats": ...}`` trees usable with
``CheckpointManager``/the pipeline. Also handles torchvision resnet50
ImageNet weights (for backbone init) and the public ``u2net.pth``.

Tensor layout conversions:
  Linear  (out,in)          -> kernel (in,out)
  Conv2d  (out,in/g,kh,kw)  -> kernel (kh,kw,in/g,out)
  ConvT2d (in,out,kh,kw)    -> kernel (kh,kw,out,in)   [transpose_kernel=True]
  BN      weight/bias/running_{mean,var} -> scale/bias + batch_stats

CLI:
  python -m ocr_vi_invoice_tpu.tools.port_torch --model svtrv2 \
      --pth best_model.pth --out weights/rec2/best_model --variant base
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple

import numpy as np

from ocr_vi_invoice_tpu.models.svtrv2 import VARIANTS


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def strip_prefixes(sd: Dict) -> Dict[str, np.ndarray]:
    """Unwrap {model_state_dict} and drop DataParallel 'module.'."""
    if "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[7:]
        out[k] = _np(v)
    return out


def linear(sd, key):
    p = {"kernel": sd[f"{key}.weight"].T}
    if f"{key}.bias" in sd:
        p["bias"] = sd[f"{key}.bias"]
    return p


def conv(sd, key, wname="weight"):
    p = {"kernel": sd[f"{key}.{wname}"].transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        p["bias"] = sd[f"{key}.bias"]
    return p


def conv_t(sd, key):
    return {
        "kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0),
        "bias": sd[f"{key}.bias"],
    }


def bn(sd, key) -> Tuple[Dict, Dict]:
    params = {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}
    stats = {"mean": sd[f"{key}.running_mean"], "var": sd[f"{key}.running_var"]}
    return params, stats


def ln(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def conv_bn(sd, conv_key, bn_key):
    """-> ConvBN module tree ({conv, bn} params, bn stats)."""
    p_bn, s_bn = bn(sd, bn_key)
    return {"conv": conv(sd, conv_key), "bn": p_bn}, {"bn": s_bn}


def mlp(sd, key):
    return {"fc1": linear(sd, f"{key}.fc1"), "fc2": linear(sd, f"{key}.fc2")}


# --------------------------------------------------------------------------- #
# SVTRv2
# --------------------------------------------------------------------------- #


def port_svtrv2(sd: Dict, variant: str = "base") -> Dict:
    sd = strip_prefixes(sd)
    cfg = VARIANTS[variant]
    params: Dict = {}
    stats: Dict = {}

    stem_p, stem_s = {}, {}
    for i in (1, 2):
        p, s = conv_bn(sd, f"stem.conv{i}", f"stem.bn{i}")
        stem_p[f"conv{i}"], stem_s[f"conv{i}"] = p, s
    params["stem"], stats["stem"] = stem_p, stem_s

    for i in range(3):
        for j in range(cfg["num_blocks"][i]):
            t = f"stages.{i}.blocks.{j}"
            name = f"stage{i}_block{j}"
            bp: Dict = {
                "norm1": ln(sd, f"{t}.norm1"),
                "norm2": ln(sd, f"{t}.norm2"),
                "mlp": mlp(sd, f"{t}.mlp"),
            }
            bs: Dict = {}
            if j < cfg["num_local"][i]:
                mp, ms = {}, {}
                for c in (1, 2):
                    p, s = conv_bn(sd, f"{t}.mixer.conv{c}", f"{t}.mixer.bn{c}")
                    mp[f"conv{c}"], ms[f"conv{c}"] = p, s
                bp["mixer"], bs["mixer"] = mp, ms
            else:
                bp["mixer"] = {
                    "qkv": linear(sd, f"{t}.mixer.qkv"),
                    "proj": linear(sd, f"{t}.mixer.proj"),
                }
            params[name] = bp
            if bs:
                stats[name] = bs
        if i < 2:
            p, s = conv_bn(sd, f"merges.{i}.conv", f"merges.{i}.norm")
            params[f"merge{i}"] = {"conv": p}
            stats[f"merge{i}"] = {"conv": s}

    params["backbone_norm"] = ln(sd, "backbone_norm")

    frm = {
        "h_qkv": linear(sd, "frm.h_qkv"),
        "h_proj": linear(sd, "frm.h_proj"),
        "h_norm": ln(sd, "frm.h_norm"),
        "h_norm2": ln(sd, "frm.h_norm2"),
        "h_mlp": mlp(sd, "frm.h_mlp"),
        "v_q": linear(sd, "frm.v_q"),
        "v_kv": linear(sd, "frm.v_kv"),
        "v_proj": linear(sd, "frm.v_proj"),
        "v_norm_q": ln(sd, "frm.v_norm_q"),
        "v_norm_kv": ln(sd, "frm.v_norm_kv"),
        "v_norm2": ln(sd, "frm.v_norm2"),
        "v_mlp": mlp(sd, "frm.v_mlp"),
        "select_token": sd["frm.select_token"],
    }
    params["frm"] = frm

    if "sgm.char_embed.weight" in sd:
        params["sgm"] = {
            "char_embed": {"embedding": sd["sgm.char_embed.weight"]},
            "context_norm": ln(sd, "sgm.context_norm"),
            "context_norm2": ln(sd, "sgm.context_norm2"),
            "context_qkv": {
                "kernel": sd["sgm.context_attn.in_proj_weight"].T,
                "bias": sd["sgm.context_attn.in_proj_bias"],
            },
            "context_out": linear(sd, "sgm.context_attn.out_proj"),
            "context_mlp": mlp(sd, "sgm.context_mlp"),
            "left_token": sd["sgm.left_token"],
            "right_token": sd["sgm.right_token"],
            "cross_q": linear(sd, "sgm.cross_q"),
            "cross_kv": linear(sd, "sgm.cross_kv"),
            "cross_proj": linear(sd, "sgm.cross_proj"),
            "cross_norm_q": ln(sd, "sgm.cross_norm_q"),
            "cross_norm_kv": ln(sd, "sgm.cross_norm_kv"),
            "sgm_head": linear(sd, "sgm.sgm_head"),
        }

    params["head"] = linear(sd, "head")
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------- #
# DBNet++ (reference layout: backbone.model.* torchvision naming)
# --------------------------------------------------------------------------- #

_R50_LAYERS = (3, 4, 6, 3)


def port_dbnet(sd: Dict, dcn: bool = True) -> Dict:
    sd = strip_prefixes(sd)
    params: Dict = {}
    stats: Dict = {}

    bb_p: Dict = {"conv1": conv(sd, "backbone.model.conv1")}
    p, s = bn(sd, "backbone.model.bn1")
    bb_p["bn1"] = p
    bb_s: Dict = {"bn1": s}

    for stage in range(4):
        for b in range(_R50_LAYERS[stage]):
            t = f"backbone.model.layer{stage + 1}.{b}"
            name = f"layer{stage + 1}_block{b}"
            blk_p: Dict = {}
            blk_s: Dict = {}
            for ci in (1, 2, 3):
                key = f"{t}.conv{ci}"
                if ci == 2 and dcn and stage >= 1:
                    blk_p["conv2"] = {
                        "offset_mask_conv": conv(sd, f"{key}.offset_mask_conv"),
                        "weight": sd[f"{key}.weight"].transpose(2, 3, 1, 0),
                    }
                else:
                    blk_p[f"conv{ci}"] = conv(sd, key)
                p, s = bn(sd, f"{t}.bn{ci}")
                blk_p[f"bn{ci}"], blk_s[f"bn{ci}"] = p, s
            if f"{t}.downsample.0.weight" in sd:
                blk_p["ds_conv"] = conv(sd, f"{t}.downsample.0")
                p, s = bn(sd, f"{t}.downsample.1")
                blk_p["ds_bn"], blk_s["ds_bn"] = p, s
            bb_p[name], bb_s[name] = blk_p, blk_s
    params["backbone"], stats["backbone"] = bb_p, bb_s

    neck_p: Dict = {}
    neck_s: Dict = {}
    for i in range(4):
        neck_p[f"lateral{i}"] = conv(sd, f"neck.lateral_convs.{i}")
        p, s = conv_bn(sd, f"neck.fpn_convs.{i}.conv", f"neck.fpn_convs.{i}.bn")
        neck_p[f"fpn{i}"], neck_s[f"fpn{i}"] = p, s
    neck_p["conv_atten"] = conv(sd, "neck.asf.conv_atten")
    params["neck"], stats["neck"] = neck_p, neck_s

    head_p: Dict = {}
    head_s: Dict = {}
    for branch in ("bin_conv", "thresh_conv"):
        t = f"head.{branch}"
        p, s = conv_bn(sd, f"{t}.0.conv", f"{t}.0.bn")
        bp = {"conv": p, "up1": conv_t(sd, f"{t}.1"), "up2": conv_t(sd, f"{t}.4")}
        bs = {"conv": s}
        p2, s2 = bn(sd, f"{t}.2")
        bp["up1_bn"], bs["up1_bn"] = p2, s2
        head_p[branch], head_s[branch] = bp, bs
    params["head"], stats["head"] = head_p, head_s

    return {"params": params, "batch_stats": stats}


def port_torchvision_resnet50_backbone(sd: Dict) -> Dict:
    """ImageNet torchvision resnet50 state_dict -> our ResNet tree (no DCN).
    Prefix the keys with 'backbone.model.' and reuse port_dbnet's walker."""
    sd = {f"backbone.model.{k}": _np(v) for k, v in strip_prefixes(sd).items()}
    full = port_dbnet(sd_with_stub_neck_head(sd), dcn=False)
    return {"params": full["params"]["backbone"],
            "batch_stats": full["batch_stats"]["backbone"]}


def sd_with_stub_neck_head(sd: Dict) -> Dict:
    """Add zero neck/head tensors so port_dbnet's walker can run on a
    backbone-only state dict."""
    sd = dict(sd)
    z = np.zeros
    chans = [256, 512, 1024, 2048]
    for i in range(4):
        sd[f"neck.lateral_convs.{i}.weight"] = z((256, chans[i], 1, 1), np.float32)
        sd[f"neck.lateral_convs.{i}.bias"] = z((256,), np.float32)
        sd[f"neck.fpn_convs.{i}.conv.weight"] = z((256, 256, 3, 3), np.float32)
        for nm, shape in (("weight", (256,)), ("bias", (256,)),
                          ("running_mean", (256,)), ("running_var", (256,))):
            sd[f"neck.fpn_convs.{i}.bn.{nm}"] = (
                np.ones(shape, np.float32) if nm in ("weight", "running_var")
                else z(shape, np.float32)
            )
    sd["neck.asf.conv_atten.weight"] = z((4, 1024, 1, 1), np.float32)
    sd["neck.asf.conv_atten.bias"] = z((4,), np.float32)
    for branch in ("bin_conv", "thresh_conv"):
        sd[f"head.{branch}.0.conv.weight"] = z((64, 256, 3, 3), np.float32)
        for nm in ("weight", "bias", "running_mean", "running_var"):
            v = np.ones((64,), np.float32) if nm in ("weight", "running_var") else z((64,), np.float32)
            sd[f"head.{branch}.0.bn.{nm}"] = v
            sd[f"head.{branch}.2.{nm}"] = v
        sd[f"head.{branch}.1.weight"] = z((64, 64, 2, 2), np.float32)
        sd[f"head.{branch}.1.bias"] = z((64,), np.float32)
        sd[f"head.{branch}.4.weight"] = z((64, 1, 2, 2), np.float32)
        sd[f"head.{branch}.4.bias"] = z((1,), np.float32)
    return sd


# --------------------------------------------------------------------------- #
# U-2-Net (public u2net.pth / u2netp.pth layout)
# --------------------------------------------------------------------------- #


def _rebnconv(sd, key):
    p, s = bn(sd, f"{key}.bn_s1")
    return {"conv": conv(sd, f"{key}.conv_s1"), "bn": p}, {"bn": s}


def _rsu(sd, key, depth, four_f=False):
    p: Dict = {}
    s: Dict = {}
    names = ["rebnconvin"] + [f"rebnconv{i}" for i in range(1, depth + 1)] + \
            [f"rebnconv{i}d" for i in range(depth - 1, 0, -1)]
    if four_f:
        names = ["rebnconvin", "rebnconv1", "rebnconv2", "rebnconv3",
                 "rebnconv4", "rebnconv3d", "rebnconv2d", "rebnconv1d"]
    for n in names:
        pp, ss = _rebnconv(sd, f"{key}.{n}")
        p[n], s[n] = pp, ss
    return p, s


_U2_STAGES = {  # stage name -> (torch key, depth, is_4f)
    "u2net": [
        ("stage1", "stage1", 7, False), ("stage2", "stage2", 6, False),
        ("stage3", "stage3", 5, False), ("stage4", "stage4", 4, False),
        ("stage5", "stage5", 0, True), ("stage6", "stage6", 0, True),
        ("stage5d", "stage5d", 0, True), ("stage4d", "stage4d", 4, False),
        ("stage3d", "stage3d", 5, False), ("stage2d", "stage2d", 6, False),
        ("stage1d", "stage1d", 7, False),
    ],
}
_U2_STAGES["u2netp"] = _U2_STAGES["u2net"]


def port_u2net(sd: Dict, variant: str = "u2net") -> Dict:
    sd = strip_prefixes(sd)
    params: Dict = {}
    stats: Dict = {}
    for name, tkey, depth, four_f in _U2_STAGES[variant]:
        p, s = _rsu(sd, tkey, depth, four_f)
        params[name], stats[name] = p, s
    for j in range(1, 7):
        params[f"side{j}"] = conv(sd, f"side{j}")
    params["outconv"] = conv(sd, "outconv")
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------- #


def main():
    import torch

    from ocr_vi_invoice_tpu.train.checkpoint import CheckpointManager

    ap = argparse.ArgumentParser(description="Port torch .pth -> flax checkpoint")
    ap.add_argument("--model", choices=["svtrv2", "dbnet", "u2net", "u2netp"],
                    required=True)
    ap.add_argument("--pth", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--variant", default="base")
    ap.add_argument("--no_dcn", action="store_true")
    args = ap.parse_args()

    sd = torch.load(args.pth, map_location="cpu", weights_only=False)
    if args.model == "svtrv2":
        tree = port_svtrv2(sd, args.variant)
        extra = {"variant": args.variant}
    elif args.model == "dbnet":
        tree = port_dbnet(sd, dcn=not args.no_dcn)
        extra = {}
    else:
        tree = port_u2net(sd, args.model)
        extra = {"variant": args.model}

    from pathlib import Path

    out = Path(args.out)
    mgr = CheckpointManager(out.parent)
    mgr._save(out.name, tree["params"], tree["batch_stats"],
              {"epoch": -1, "best_metric": 0.0, **extra})
    print(f"Ported {args.model} -> {out}")


if __name__ == "__main__":
    main()
