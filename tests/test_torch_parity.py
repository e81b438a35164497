"""Golden parity: port reference torch weights -> identical outputs.

These tests run the ACTUAL reference implementation (PyTorch, from
/root/reference) side by side with ours on the same weights and inputs.
Skipped automatically when the reference checkout or torch is absent.
"""

import os
import shutil
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference checkout not available"),
]
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_rec_module(tmp_path_factory):
    """Importable copy of the reference rec2 package (its det package pulls
    torchvision, which this image lacks)."""
    root = tmp_path_factory.mktemp("refsvtr")
    pkg = root / "model" / "rec2"
    pkg.mkdir(parents=True)
    (root / "model" / "__init__.py").write_text("")
    (pkg / "__init__.py").write_text("")
    for f in ("svtrv2.py", "tokenizer.py", "vocab.py"):
        shutil.copy(f"{REF}/model/rec2/{f}", pkg / f)
    sys.path.insert(0, str(root))
    yield root
    sys.path.remove(str(root))
    for m in list(sys.modules):
        if m == "model" or m.startswith("model."):
            del sys.modules[m]


def test_svtrv2_output_parity(ref_rec_module):
    import jax.numpy as jnp

    from model.rec2.svtrv2 import SVTRv2 as TorchSVTRv2

    from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2
    from ocr_vi_invoice_tpu.tools.port_torch import port_svtrv2

    tm = TorchSVTRv2(variant="tiny").eval()
    x = torch.randn(2, 3, 32, 64)
    with torch.inference_mode():
        ref = tm(x).numpy()  # (T, B, C) log-probs

    tree = port_svtrv2(tm.state_dict(), "tiny")
    model = SVTRv2(variant="tiny")
    ours = model.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    ours = np.asarray(ours).transpose(1, 0, 2)  # (B,T,C) -> (T,B,C)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_svtrv2_sgm_parity(ref_rec_module):
    """SGM in isolation (it has no BatchNorm, so train/eval-mode statistics
    cannot confound the comparison): same visual features + targets ->
    identical left/right logits."""
    import jax.numpy as jnp

    from model.rec2.svtrv2 import SVTRv2 as TorchSVTRv2

    from ocr_vi_invoice_tpu.models.svtrv2 import SGM
    from ocr_vi_invoice_tpu.tools.port_torch import port_svtrv2

    tm = TorchSVTRv2(variant="tiny").eval()
    x = torch.randn(2, 3, 32, 64)
    targets = torch.tensor([[5, 6, 7, 1], [8, 9, 1, 1]])
    with torch.inference_mode():
        feats, H, W = tm.extract_features(x)
        ref_sgm = tm.sgm(feats, targets, pad_id=1)

    tree = port_svtrv2(tm.state_dict(), "tiny")
    sgm = SGM(dim=256, num_classes=tm.tokenizer.num_classes, context_window=3)
    ours = sgm.apply(
        {"params": tree["params"]["sgm"]},
        jnp.asarray(feats.numpy()),
        jnp.asarray(targets.numpy()),
    )
    for k in ("sgm_left", "sgm_right"):
        np.testing.assert_allclose(
            np.asarray(ours[k]), ref_sgm[k].numpy(), rtol=1e-3, atol=1e-4
        )


@pytest.fixture(scope="module")
def ref_det_module(tmp_path_factory):
    root = tmp_path_factory.mktemp("refdet")
    pkg = root / "dmodel" / "det"
    pkg.mkdir(parents=True)
    (root / "dmodel" / "__init__.py").write_text("")
    (pkg / "__init__.py").write_text("")
    for f in ("neck.py", "head.py", "layers.py"):
        src = open(f"{REF}/model/det/{f}").read().replace("model.det.", "dmodel.det.")
        (pkg / f).write_text(src)
    sys.path.insert(0, str(root))
    yield root
    sys.path.remove(str(root))
    for m in list(sys.modules):
        if m == "dmodel" or m.startswith("dmodel."):
            del sys.modules[m]


def test_neck_head_parity(ref_det_module):
    """FPN+ASF neck and DB head match the reference exactly on ported
    weights (the reference backbone needs torchvision, unavailable here;
    the ResNet is covered by exact param-count tests instead)."""
    import jax.numpy as jnp

    from dmodel.det.head import DBHead as TorchHead
    from dmodel.det.neck import FPN_ASF as TorchNeck

    from ocr_vi_invoice_tpu.models.dbnet import DBHead, FPN_ASF
    from ocr_vi_invoice_tpu.tools.port_torch import (
        bn, conv, conv_bn, conv_t, strip_prefixes,
    )

    tn = TorchNeck([64, 96, 128, 160], inner_channels=64).eval()
    th = TorchHead(64).eval()
    feats_t = [torch.randn(1, c, s, s) for c, s in
               zip([64, 96, 128, 160], [16, 8, 4, 2])]
    with torch.inference_mode():
        fused_ref = tn(feats_t).numpy()
        out_ref = th(torch.tensor(fused_ref))

    nsd = strip_prefixes(tn.state_dict())
    neck_p, neck_s = {}, {}
    for i in range(4):
        neck_p[f"lateral{i}"] = conv(nsd, f"lateral_convs.{i}")
        p, s = conv_bn(nsd, f"fpn_convs.{i}.conv", f"fpn_convs.{i}.bn")
        neck_p[f"fpn{i}"], neck_s[f"fpn{i}"] = p, s
    neck_p["conv_atten"] = conv(nsd, "asf.conv_atten")

    neck = FPN_ASF(64)
    fused = neck.apply(
        {"params": neck_p, "batch_stats": neck_s},
        [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t],
    )
    np.testing.assert_allclose(
        np.asarray(fused), fused_ref.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-5
    )

    hsd = strip_prefixes(th.state_dict())
    head_p, head_s = {}, {}
    for branch in ("bin_conv", "thresh_conv"):
        p, s = conv_bn(hsd, f"{branch}.0.conv", f"{branch}.0.bn")
        bp = {"conv": p, "up1": conv_t(hsd, f"{branch}.1"),
              "up2": conv_t(hsd, f"{branch}.4")}
        bs = {"conv": s}
        p2, s2 = bn(hsd, f"{branch}.2")
        bp["up1_bn"], bs["up1_bn"] = p2, s2
        head_p[branch], head_s[branch] = bp, bs

    head = DBHead(64)
    ours = head.apply(
        {"params": head_p, "batch_stats": head_s},
        jnp.asarray(fused_ref.transpose(0, 2, 3, 1)),
    )
    for k in ("binary", "thresh", "thresh_binary"):
        np.testing.assert_allclose(
            np.asarray(ours[k])[..., 0], out_ref[k].numpy()[:, 0],
            rtol=1e-3, atol=1e-5,
        )
