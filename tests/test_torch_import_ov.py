"""OV_Uni3DETR torch-checkpoint importer tests.

Builds a reference-layout OV state_dict (module/key layout per
ov_uni3detr.py:62-116, uni3detr_head_clip.py:379-430, mmdet ResNet/FPN,
uni3d_viewtrans.py:56-102), imports it, and checks:
- structural equality with OV_Uni3DETR(cfg).init (params + batch_stats
  + constants), strict key consumption incl. the dead pts_conv/img_conv;
- numeric parity of the new 2D mappings against torch oracles:
  ResNet bottleneck block (stride 1 and 2), DCNv2 in the zero-offset
  degenerate mode (== 0.5 * plain conv via the sigmoid mask), FPN
  top-down pathway, and the trans_conv/time_conv BN folding.
"""
import dataclasses
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from uni3detr_tpu.models.config import OVUni3DETRConfig
from uni3detr_tpu.models.ov_detector import OV_Uni3DETR
from uni3detr_tpu.models.resnet import ResNet, FPN, _Bottleneck
from uni3detr_tpu.models.dcn import DeformConv2dV2
from uni3detr_tpu.train.torch_import import (import_torch_state_dict_ov,
                                             check_structure)
from test_torch_import import make_state_dict
from test_ov import OV_TINY, _ov_batch


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _lin(sd, rng, k, i, o):
    sd[k + ".weight"] = (rng.randn(o, i) * math.sqrt(2.0 / (i + o))
                         ).astype(np.float32)
    sd[k + ".bias"] = (0.02 * rng.randn(o)).astype(np.float32)


def _ln(sd, rng, k, c):
    sd[k + ".weight"] = (1 + 0.1 * rng.randn(c)).astype(np.float32)
    sd[k + ".bias"] = (0.05 * rng.randn(c)).astype(np.float32)


def _bn(sd, rng, k, c):
    sd[k + ".weight"] = (1 + 0.1 * rng.randn(c)).astype(np.float32)
    sd[k + ".bias"] = (0.05 * rng.randn(c)).astype(np.float32)
    sd[k + ".running_mean"] = (0.1 * rng.randn(c)).astype(np.float32)
    sd[k + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
    sd[k + ".num_batches_tracked"] = np.asarray(100, np.int64)


def _conv2(sd, rng, k, o, i, kh, kw, bias=False):
    sd[k + ".weight"] = (rng.randn(o, i, kh, kw)
                         * math.sqrt(2.0 / (kh * kw * i))).astype(np.float32)
    if bias:
        sd[k + ".bias"] = (0.02 * rng.randn(o)).astype(np.float32)


def _conv3(sd, rng, k, o, i, kd, kh, kw, bias=True):
    sd[k + ".weight"] = (rng.randn(o, i, kd, kh, kw) * math.sqrt(
        2.0 / (kd * kh * kw * i))).astype(np.float32)
    if bias:
        sd[k + ".bias"] = (0.02 * rng.randn(o)).astype(np.float32)


def make_ov_state_dict(cfg, rng):
    # lidar branch + shared decoder layout from the base generator,
    # minus its (non-CLIP) head branch keys
    sd = {k: v for k, v in make_state_dict(cfg, rng).items()
          if not any(f"pts_bbox_head.{b}_branches" in k
                     for b in ("cls", "reg", "iou"))}
    C = cfg.embed_dim

    # image backbone: mmdet ResNet-50 pytorch-style
    bb = "img_backbone"
    _conv2(sd, rng, f"{bb}.conv1", 64, 3, 7, 7)
    _bn(sd, rng, f"{bb}.bn1", 64)
    inplanes = 64
    for i, n in enumerate((3, 4, 6, 3)):
        planes = 64 * (2 ** i)
        for j in range(n):
            src = f"{bb}.layer{i+1}.{j}"
            _conv2(sd, rng, f"{src}.conv1", planes, inplanes, 1, 1)
            if cfg.stage_with_dcn[i]:
                _conv2(sd, rng, f"{src}.conv2", planes, planes, 3, 3)
                _conv2(sd, rng, f"{src}.conv2.conv_offset", 27, planes,
                       3, 3, bias=True)
            else:
                _conv2(sd, rng, f"{src}.conv2", planes, planes, 3, 3)
            _conv2(sd, rng, f"{src}.conv3", planes * 4, planes, 1, 1)
            for bi, c in ((1, planes), (2, planes), (3, planes * 4)):
                _bn(sd, rng, f"{src}.bn{bi}", c)
            if j == 0:
                _conv2(sd, rng, f"{src}.downsample.0", planes * 4,
                       inplanes, 1, 1)
                _bn(sd, rng, f"{src}.downsample.1", planes * 4)
            inplanes = planes * 4
    # FPN
    for i, ic in enumerate((256, 512, 1024, 2048)):
        _conv2(sd, rng, f"img_neck.lateral_convs.{i}.conv", C, ic, 1, 1,
               bias=True)
        _conv2(sd, rng, f"img_neck.fpn_convs.{i}.conv", C, C, 3, 3,
               bias=True)
    _conv2(sd, rng, "input_proj", C, C, 1, 1, bias=True)
    _conv2(sd, rng, "depth_net", cfg.depth_dim, C, 1, 1, bias=True)
    # view transform conv stack
    kd, kh, kw = cfg.view_kernel
    for k in range(cfg.num_view_convs):
        _conv3(sd, rng, f"view_trans.conv_trans_head_{k+1}.0", C, C,
               kd, kh, kw)
        _bn(sd, rng, f"view_trans.conv_trans_head_{k+1}.1", C)
    # multimodal fusion (+ the dead pts_conv/img_conv modules)
    _conv3(sd, rng, "conv_trans_head_1.0", C, 2 * C, 3, 3, 3)
    _bn(sd, rng, "conv_trans_head_1.1", C)
    for dead in ("pts_conv", "img_conv"):
        _conv3(sd, rng, f"{dead}.0", C, C, 3, 3, 3)
        _bn(sd, rng, f"{dead}.1", C)

    # CLIP head branches
    ph = "pts_bbox_head"
    D = cfg.clip_dim
    for l in range(cfg.num_decoder_layers):
        _lin(sd, rng, f"{ph}.cls_branches.{l}.0", C, D)
        _ln(sd, rng, f"{ph}.cls_branches.{l}.1", D)
        _lin(sd, rng, f"{ph}.cls_branches.{l}.3", D, D)
        _ln(sd, rng, f"{ph}.cls_branches.{l}.4", D)
        for s in (0, 3):
            _lin(sd, rng, f"{ph}.uncertainty_branches.{l}.{s}", C, C)
        for s in (1, 4):
            _ln(sd, rng, f"{ph}.uncertainty_branches.{l}.{s}", C)
        _lin(sd, rng, f"{ph}.uncertainty_branches.{l}.6", C,
             cfg.num_classes + 1)
        for br, out in (("reg", cfg.code_size), ("iou", 1)):
            for s in (0, 2):
                _lin(sd, rng, f"{ph}.{br}_branches.{l}.{s}", C, C)
            _lin(sd, rng, f"{ph}.{br}_branches.{l}.4", C, out)
    zs = rng.randn(cfg.num_classes, D).astype(np.float32)
    zs /= np.linalg.norm(zs, axis=1, keepdims=True)
    sd[f"{ph}.zs_weights"] = np.ascontiguousarray(zs.T)  # (clip, ncls)
    return sd


def test_ov_import_structure():
    cfg = OV_TINY
    rng = np.random.RandomState(0)
    sd = make_ov_state_dict(cfg, rng)
    variables = import_torch_state_dict_ov(sd, cfg, strict=True)

    model = OV_Uni3DETR(cfg)
    batch, _ = _ov_batch(B=1)
    rp = jnp.full((1, cfg.num_query, 3), 0.5)
    ref = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "modality": jax.random.PRNGKey(1)},
                           batch, train=False, random_points=rp))
    missing, extra, mismatched = check_structure(
        {k: variables[k] for k in ("params", "batch_stats")}, ref)
    assert not missing, f"missing: {missing[:6]}"
    assert not extra, f"extra: {extra[:6]}"
    assert not mismatched, f"mismatched: {mismatched[:6]}"
    assert ref["constants"]["pts_bbox_head"]["zs_weights"].shape \
        == variables["constants"]["pts_bbox_head"]["zs_weights"].shape
    zs = variables["constants"]["pts_bbox_head"]["zs_weights"]
    assert zs.shape == (cfg.num_classes, cfg.clip_dim)
    np.testing.assert_allclose(
        zs, sd["pts_bbox_head.zs_weights"].T, atol=0)


def test_ov_import_camera_only():
    """Camera-only checkpoint (no pts_* / fusion keys) against a
    use_lidar=False config (ov_uni3detr_sunrgbd_rgb layout)."""
    cfg = dataclasses.replace(OV_TINY, use_lidar=False, multimodal=False)
    rng = np.random.RandomState(4)
    sd = {k: v for k, v in make_ov_state_dict(OV_TINY, rng).items()
          if not k.startswith(("pts_middle_encoder.", "pts_backbone.",
                               "pts_neck.", "conv_trans_head_1.",
                               "pts_conv.", "img_conv."))}
    variables = import_torch_state_dict_ov(sd, cfg, strict=True)
    model = OV_Uni3DETR(cfg)
    batch, _ = _ov_batch(B=1, with_pts=False)
    rp = jnp.full((1, cfg.num_query, 3), 0.5)
    ref = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "modality": jax.random.PRNGKey(1)},
                           batch, train=False, random_points=rp))
    missing, extra, mismatched = check_structure(
        {k: variables[k] for k in ("params", "batch_stats")}, ref)
    assert not missing and not extra and not mismatched, (
        missing[:4], extra[:4], mismatched[:4])


def test_ov_import_forward_runs():
    """Imported variables drive the full OV eval forward (smoke +
    finiteness; full numeric oracle lives at the block level below)."""
    cfg = OV_TINY
    rng = np.random.RandomState(1)
    variables = import_torch_state_dict_ov(make_ov_state_dict(cfg, rng),
                                           cfg, strict=True)
    model = OV_Uni3DETR(cfg)
    batch, _ = _ov_batch(B=1)
    rp = jnp.full((1, cfg.num_query, 3), 0.5)
    out = model.apply({k: variables[k] for k in
                       ("params", "batch_stats", "constants")},
                      batch, train=False, random_points=rp)
    for k in ("all_cls_scores", "all_bbox_preds", "all_iou_preds",
              "all_uncertainty_preds"):
        assert np.isfinite(np.asarray(out[k])).all()


def _torch_bottleneck(sd, pre, x, stride, downsample):
    def bn(k, y):
        return F.batch_norm(y, t(sd[k + ".running_mean"]),
                            t(sd[k + ".running_var"]),
                            t(sd[k + ".weight"]), t(sd[k + ".bias"]),
                            False, 0.0, 1e-5)
    y = F.conv2d(x, t(sd[pre + ".conv1.weight"]))
    y = F.relu(bn(pre + ".bn1", y))
    y = F.conv2d(y, t(sd[pre + ".conv2.weight"]), stride=stride, padding=1)
    y = F.relu(bn(pre + ".bn2", y))
    y = F.conv2d(y, t(sd[pre + ".conv3.weight"]))
    y = bn(pre + ".bn3", y)
    identity = x
    if downsample:
        identity = bn(pre + ".downsample.1",
                      F.conv2d(x, t(sd[pre + ".downsample.0.weight"]),
                               stride=stride))
    return F.relu(y + identity)


@pytest.mark.parametrize("stride", [1, 2])
def test_resnet_bottleneck_torch_parity(stride):
    """flax _Bottleneck with imported weights == torch bottleneck,
    including the stride-2 padding alignment (explicit (1,1) pad)."""
    rng = np.random.RandomState(2)
    sd = {}
    pre = "layer.0"
    planes, inplanes = 8, 16
    _conv2(sd, rng, f"{pre}.conv1", planes, inplanes, 1, 1)
    _conv2(sd, rng, f"{pre}.conv2", planes, planes, 3, 3)
    _conv2(sd, rng, f"{pre}.conv3", planes * 4, planes, 1, 1)
    for bi, c in ((1, planes), (2, planes), (3, planes * 4)):
        _bn(sd, rng, f"{pre}.bn{bi}", c)
    _conv2(sd, rng, f"{pre}.downsample.0", planes * 4, inplanes, 1, 1)
    _bn(sd, rng, f"{pre}.downsample.1", planes * 4)

    from uni3detr_tpu.train.torch_import import _SD, _conv2d, _bn as bn_im
    s = _SD(sd)
    params = {"conv1": {"kernel": _conv2d(s, f"{pre}.conv1")},
              "conv2": {"kernel": _conv2d(s, f"{pre}.conv2")},
              "conv3": {"kernel": _conv2d(s, f"{pre}.conv3")},
              "ds_conv": {"kernel": _conv2d(s, f"{pre}.downsample.0")}}
    stats = {}
    for name, src in (("bn1", f"{pre}.bn1"), ("bn2", f"{pre}.bn2"),
                      ("bn3", f"{pre}.bn3"),
                      ("ds_bn", f"{pre}.downsample.1")):
        bp, bs = bn_im(s, src)
        params[name] = bp
        stats[name] = bs

    x = rng.randn(1, 9, 11, inplanes).astype(np.float32)
    mod = _Bottleneck(planes, strides=stride, use_dcn=False,
                      downsample=True)
    got = mod.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x), train=False)
    want = _torch_bottleneck(sd, pre, t(x).permute(0, 3, 1, 2), stride,
                             True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_dcn_zero_offset_degenerates_to_half_conv():
    """mmcv ModulatedDeformConv2d with zero conv_offset output == plain
    conv scaled by sigmoid(0)=0.5 (offsets 0, all masks 0.5). Pins the
    (out,in,kh,kw) -> (kk,in,out) weight mapping and tap layout."""
    rng = np.random.RandomState(3)
    C, O = 6, 5
    w = (rng.randn(O, C, 3, 3) * 0.2).astype(np.float32)
    kernel = w.transpose(2, 3, 1, 0).reshape(9, C, O)
    x = rng.randn(1, 8, 10, C).astype(np.float32)
    for stride in (1, 2):
        mod = DeformConv2dV2(O, 3, stride)
        Ho = -(-8 // stride)
        Wo = -(-10 // stride)
        params = {"kernel": kernel,
                  "offset_conv": {
                      "kernel": np.zeros((3, 3, C, 27), np.float32),
                      "bias": np.zeros(27, np.float32)}}
        got = mod.apply({"params": params}, jnp.asarray(x))
        want = 0.5 * F.conv2d(t(x).permute(0, 3, 1, 2), t(w),
                              stride=stride, padding=1)
        want = want.permute(0, 2, 3, 1).numpy()
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_fpn_torch_parity():
    """FPN top-down pathway + param-free extra level vs an mmdet-style
    torch oracle (lateral 1x1, nearest upsample-add, 3x3 out convs,
    max_pool2d(1, stride=2) extra)."""
    rng = np.random.RandomState(4)
    C = 8
    chans = (4, 6, 8, 12)
    # exact /2 level ratios like a real stride-4..32 pyramid (jax and
    # torch 'nearest' agree at integer factors; they pick different
    # source pixels at fractional scales, which FPN never produces)
    feats = [rng.randn(1, 16 // (2 ** i), 24 // (2 ** i), c)
             .astype(np.float32) for i, c in enumerate(chans)]
    sd = {}
    for i, c in enumerate(chans):
        _conv2(sd, rng, f"n.lateral_convs.{i}.conv", C, c, 1, 1, bias=True)
        _conv2(sd, rng, f"n.fpn_convs.{i}.conv", C, C, 3, 3, bias=True)

    from uni3detr_tpu.train.torch_import import _SD, _import_fpn
    params = _import_fpn(_SD(sd), "n")
    got = FPN(out_channels=C, num_outs=5).apply(
        {"params": params}, tuple(jnp.asarray(f) for f in feats))

    lat = [F.conv2d(t(f).permute(0, 3, 1, 2),
                    t(sd[f"n.lateral_convs.{i}.conv.weight"]),
                    t(sd[f"n.lateral_convs.{i}.conv.bias"]))
           for i, f in enumerate(feats)]
    for i in range(len(lat) - 1, 0, -1):
        lat[i - 1] = lat[i - 1] + F.interpolate(
            lat[i], size=lat[i - 1].shape[-2:], mode="nearest")
    outs = [F.conv2d(l, t(sd[f"n.fpn_convs.{i}.conv.weight"]),
                     t(sd[f"n.fpn_convs.{i}.conv.bias"]), padding=1)
            for i, l in enumerate(lat)]
    outs.append(F.max_pool2d(outs[-1], 1, stride=2))
    for g, w in zip(got, outs):
        np.testing.assert_allclose(np.asarray(g),
                                   w.permute(0, 2, 3, 1).numpy(),
                                   atol=2e-5)


def test_trans_conv_bn_folding():
    """trans_conv/time_conv import folds eval-mode BN3d into the Dense:
    Dense(folded)(x) == BN(Conv1x1(x)) from the torch Sequential."""
    rng = np.random.RandomState(5)
    C = 8
    sd = {}
    _conv3(sd, rng, "v.trans_conv.0", C, 2 * C, 1, 1, 1)
    _bn(sd, rng, "v.trans_conv.1", C)
    cfg = dataclasses.replace(OV_TINY, num_view_convs=0)
    from uni3detr_tpu.train.torch_import import _SD, _import_view_trans
    p, _ = _import_view_trans(_SD(sd), cfg, "v")
    x = rng.randn(40, 2 * C).astype(np.float32)
    got = x @ p["trans_conv"]["kernel"] + p["trans_conv"]["bias"]
    xt = t(x).T[None, :, :, None, None]  # (1, 2C, 40, 1, 1)
    y = F.conv3d(xt, t(sd["v.trans_conv.0.weight"]),
                 t(sd["v.trans_conv.0.bias"]))
    y = F.batch_norm(y, t(sd["v.trans_conv.1.running_mean"]),
                     t(sd["v.trans_conv.1.running_var"]),
                     t(sd["v.trans_conv.1.weight"]),
                     t(sd["v.trans_conv.1.bias"]), False, 0.0, 1e-5)
    want = y[0, :, :, 0, 0].T.numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_import_tool_end_to_end(tmp_path, monkeypatch):
    """tools/import_torch_ckpt.py converts a .pth (lidar tiny preset)
    into an orbax checkpoint, with the structural verify enabled."""
    import sys, os, runpy
    rng = np.random.RandomState(6)
    from uni3detr_tpu.presets import PRESETS
    cfg = PRESETS["uni3detr_tiny_synthetic"]
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in make_state_dict(cfg, rng).items()}
    ckpt = str(tmp_path / "ref.pth")
    torch.save({"state_dict": sd, "meta": {"epoch": 12}}, ckpt)
    out = str(tmp_path / "orbax")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.setattr(sys, "argv", [
        "import_torch_ckpt", ckpt, out,
        "--preset", "uni3detr_tiny_synthetic"])
    runpy.run_path(os.path.join(repo, "tools", "import_torch_ckpt.py"),
                   run_name="__main__")
    assert os.path.exists(out)
    from uni3detr_tpu.train.checkpoint import load_checkpoint
    restored, meta = load_checkpoint(out)
    assert meta["preset"] == "uni3detr_tiny_synthetic"
    n = sum(int(np.prod(v.shape)) for v in
            jax.tree_util.tree_leaves(restored["params"]))
    assert n > 1000
