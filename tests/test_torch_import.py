"""Torch-checkpoint importer tests (VERDICT round-2 item 1).

The released checkpoints are not available in this image, so the tests
build a state_dict with the EXACT reference key layout and shapes
(derived from the cited module definitions — see
uni3detr_tpu/train/torch_import.py's module docstring), import it, and
assert:

1. structural equality with ``Uni3DETR(cfg).init`` (every leaf path +
   shape) on the tiny config and on real presets via eval_shape;
2. FULL-MODEL forward parity against an independent torch/numpy oracle
   that reads the ORIGINAL state_dict keys (so a wrong mapping cannot
   cancel out), at the real SUN RGB-D config scale (3 decoder layers,
   nq=300, grid [128,320,320], C=256) and at the KITTI 9-decoder-layer
   scale (real depth/channels/nq; H/W grid reduced 4x — the full
   [41,1600,1408] dense grid is out of reach for the single-core CPU
   test runner, and grid extent does not interact with weight mapping);
3. spconv-v2 (out,kd,kh,kw,in) weight layouts are auto-detected and
   produce identical parameters to the mmcv (kd,kh,kw,in,out) layout.

Oracle notes: sparse convs follow the cross-correlation convention
pinned by tests/test_parity_torch.py::test_sparse_encoder_parity (out[p]
= sum_k W[k] @ in[p + k - pad]); strided output sites are the covered-
input set (spconv SparseConv3d semantics); BN runs in eval mode on the
running stats carried by the checkpoint.
"""
import dataclasses
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from uni3detr_tpu.models.config import Uni3DETRConfig
from uni3detr_tpu.models.detector import Uni3DETR
from uni3detr_tpu.presets import SUNRGBD, KITTI_CAR, TINY_SYNTHETIC
from uni3detr_tpu.train.torch_import import (import_torch_state_dict,
                                             check_structure)


# ---------------------------------------------------------------------------
# reference-layout state_dict generator
# ---------------------------------------------------------------------------

def make_state_dict(cfg: Uni3DETRConfig, rng, spconv_v2=False):
    sd = {}

    def lin(k, i, o, std=None):
        s = std if std is not None else math.sqrt(2.0 / (i + o))
        sd[k + ".weight"] = (rng.randn(o, i) * s).astype(np.float32)
        sd[k + ".bias"] = (rng.randn(o) * 0.02).astype(np.float32)

    def ln(k, c):
        sd[k + ".weight"] = (1 + 0.1 * rng.randn(c)).astype(np.float32)
        sd[k + ".bias"] = (0.05 * rng.randn(c)).astype(np.float32)

    def bn(k, c):
        sd[k + ".weight"] = (1 + 0.1 * rng.randn(c)).astype(np.float32)
        sd[k + ".bias"] = (0.05 * rng.randn(c)).astype(np.float32)
        sd[k + ".running_mean"] = (0.1 * rng.randn(c)).astype(np.float32)
        sd[k + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[k + ".num_batches_tracked"] = np.asarray(100, np.int64)

    def spw(k, i, o, kd=3, kh=3, kw=3):
        w = (rng.randn(kd, kh, kw, i, o)
             * math.sqrt(2.0 / (kd * kh * kw * i))).astype(np.float32)
        if spconv_v2:
            w = np.ascontiguousarray(w.transpose(4, 0, 1, 2, 3))
        sd[k + ".weight"] = w

    def conv(k, o, i, kd, kh, kw):
        sd[k + ".weight"] = (rng.randn(o, i, kd, kh, kw) * math.sqrt(
            2.0 / (kd * kh * kw * i))).astype(np.float32)

    def deconv(k, i, o, kd, kh, kw):
        sd[k + ".weight"] = (rng.randn(i, o, kd, kh, kw) * math.sqrt(
            2.0 / (kd * kh * kw * i))).astype(np.float32)

    # -- sparse encoder (sparse_encoder_hd.py:70-214, basicblock mode)
    pe = "pts_middle_encoder"
    spw(f"{pe}.conv_input.0", cfg.in_point_features,
        cfg.encoder_base_channels)
    bn(f"{pe}.conv_input.1", cfg.encoder_base_channels)
    n_stages = len(cfg.encoder_channels)
    in_c = cfg.encoder_base_channels
    for i, blocks in enumerate(cfg.encoder_channels):
        last_strided = i < n_stages - 1
        body = blocks[:-1] if last_strided else blocks
        for j, c in enumerate(body):
            src = f"{pe}.encoder_layers.encoder_layer{i+1}.{j}"
            spw(f"{src}.conv1", c, c)
            bn(f"{src}.bn1", c)
            spw(f"{src}.conv2", c, c)
            bn(f"{src}.bn2", c)
            in_c = c
        if last_strided:
            src = f"{pe}.encoder_layers.encoder_layer{i+1}.{len(body)}"
            spw(f"{src}.0", in_c, blocks[-1])
            bn(f"{src}.1", blocks[-1])
            in_c = blocks[-1]
    spw(f"{pe}.conv_out.0", in_c, cfg.encoder_out_channels, 1, 1, 1)
    bn(f"{pe}.conv_out.1", cfg.encoder_out_channels)

    # -- backbone (second_3d.py:74-79): all stages read the 256-ch volume
    pb = "pts_backbone"
    for i, n in enumerate(cfg.backbone_layers):
        o = cfg.backbone_channels[i]
        conv(f"{pb}.blocks.{i}.0", o, cfg.encoder_out_channels, 1, 3, 3)
        bn(f"{pb}.blocks.{i}.1", o)
        for j in range(1, n + 1):
            conv(f"{pb}.blocks.{i}.{3*j}", o, o, 1, 3, 3)
            bn(f"{pb}.blocks.{i}.{3*j+1}", o)

    # -- neck (second3d_fpn.py:48-104)
    pn = "pts_neck"
    for i, us in enumerate(cfg.neck_upsample_strides):
        o = cfg.neck_channels[i]
        if us > 1:
            deconv(f"{pn}.deblocks.{i}.0", cfg.backbone_channels[i], o,
                   1, us, us)
        else:
            conv(f"{pn}.deblocks.{i}.0", o, cfg.backbone_channels[i],
                 1, 1, 1)
        bn(f"{pn}.deblocks.{i}.1", o)
    for j in range(3):
        conv(f"{pn}.extra_blocks.{3*j}", cfg.neck_channels[-1],
             cfg.neck_channels[-1], 3, 3, 3)
        bn(f"{pn}.extra_blocks.{3*j+1}", cfg.neck_channels[-1])

    # -- head (uni3detr_head.py:365-411)
    ph = "pts_bbox_head"
    C, nq = cfg.embed_dim, cfg.num_query
    sd[f"{ph}.tgt_embed.weight"] = rng.randn(2 * nq, C).astype(np.float32)
    sd[f"{ph}.refpoint_embed.weight"] = rng.randn(nq, 3).astype(np.float32)
    sd[f"{ph}.code_weights"] = np.ones(cfg.code_size, np.float32)  # buffer
    for l in range(cfg.num_decoder_layers):
        for s in (0, 3):
            lin(f"{ph}.cls_branches.{l}.{s}", C, C)
        for s in (1, 4):
            ln(f"{ph}.cls_branches.{l}.{s}", C)
        lin(f"{ph}.cls_branches.{l}.6", C, cfg.num_classes)
        for br, out in (("reg", cfg.code_size), ("iou", 1)):
            for s in (0, 2):
                lin(f"{ph}.{br}_branches.{l}.{s}", C, C)
            lin(f"{ph}.{br}_branches.{l}.4", C, out, std=0.05)
    dec = f"{ph}.transformer.decoder"
    for i, (di, do) in enumerate(((3 * 128, C), (C, C), (C, C))):
        lin(f"{dec}.ref_point_head.layers.{i}", di, do)
    for i in range(3):
        lin(f"{dec}.query_scale.layers.{i}", C, C)
    for l in range(cfg.num_decoder_layers):
        src = f"{dec}.layers.{l}"
        sd[f"{src}.attentions.0.attn.in_proj_weight"] = (
            rng.randn(3 * C, C) / math.sqrt(C)).astype(np.float32)
        sd[f"{src}.attentions.0.attn.in_proj_bias"] = (
            0.02 * rng.randn(3 * C)).astype(np.float32)
        lin(f"{src}.attentions.0.attn.out_proj", C, C)
        lin(f"{src}.attentions.1.attention_weights", C, 1)
        lin(f"{src}.attentions.1.output_proj", C, C)
        lin(f"{src}.attentions.1.position_encoder.0", 3, C)
        ln(f"{src}.attentions.1.position_encoder.1", C)
        lin(f"{src}.attentions.1.position_encoder.3", C, C)
        ln(f"{src}.attentions.1.position_encoder.4", C)
        lin(f"{src}.ffns.0.layers.0.0", C, cfg.ffn_dim)
        lin(f"{src}.ffns.0.layers.1", cfg.ffn_dim, C)
        for i in range(3):
            ln(f"{src}.norms.{i}", C)
    return sd


# ---------------------------------------------------------------------------
# torch/numpy oracle reading the raw state_dict
# ---------------------------------------------------------------------------

def t(x):
    # pass torch tensors through so the oracles stay differentiable when a
    # requires_grad state_dict is fed (test_train_math_parity.py)
    if isinstance(x, torch.Tensor):
        return x
    return torch.from_numpy(np.asarray(x, np.float32))


def _sd_lin(sd, k, x):
    return F.linear(x, t(sd[k + ".weight"]), t(sd[k + ".bias"]))


def _sd_ln(sd, k, x):
    return F.layer_norm(x, (x.shape[-1],), t(sd[k + ".weight"]),
                        t(sd[k + ".bias"]), 1e-5)


def _bn_eval(sd, k, x):
    """BN eval on channel-last numpy array (any rank)."""
    rm, rv = sd[k + ".running_mean"], sd[k + ".running_var"]
    w, b = sd[k + ".weight"], sd[k + ".bias"]
    return (x - rm) / np.sqrt(rv + 1e-3) * w + b


_OFFS = np.stack(np.meshgrid(np.arange(3), np.arange(3), np.arange(3),
                             indexing="ij"), -1).reshape(-1, 3)


class _SiteSet:
    def __init__(self, sites, grid):
        self.sites = sites  # (V, 3) int z,y,x
        self.grid = grid
        D, H, W = grid
        self.table = np.full((D, H, W), -1, np.int64)
        self.table[sites[:, 0], sites[:, 1], sites[:, 2]] = \
            np.arange(len(sites))

    def lookup(self, q):
        """(M, 3) -> row idx or -1 (handles out-of-grid)."""
        D, H, W = self.grid
        inb = ((q[:, 0] >= 0) & (q[:, 0] < D) & (q[:, 1] >= 0)
               & (q[:, 1] < H) & (q[:, 2] >= 0) & (q[:, 2] < W))
        out = np.full(len(q), -1, np.int64)
        qq = q[inb]
        out[inb] = self.table[qq[:, 0], qq[:, 1], qq[:, 2]]
        return out


def _subm_conv(x, ss: _SiteSet, w):
    """w (3,3,3,i,o) mmcv layout; out[p] = sum_k in[p + k - 1] @ w[k]."""
    V = len(ss.sites)
    out = np.zeros((V, w.shape[-1]), np.float32)
    for k in range(27):
        off = _OFFS[k] - 1
        j = ss.lookup(ss.sites + off)
        sel = j >= 0
        if sel.any():
            out[sel] += x[j[sel]] @ w[tuple(_OFFS[k])]
    return out


def _strided_sites(ss: _SiteSet, pad, grid):
    """Covered-output site set of a stride-2 kernel-3 conv."""
    pad = np.asarray(pad)
    num = ss.sites[:, None, :] + pad[None, None, :] - _OFFS[None, :, :]
    ok = (num % 2 == 0).all(-1) & (num >= 0).all(-1)
    div = num // 2
    og = tuple((g + 2 * p - 3) // 2 + 1 for g, p in zip(grid, pad))
    ok &= (div[..., 0] < og[0]) & (div[..., 1] < og[1]) & (div[..., 2] < og[2])
    cand = div[ok]
    lin = (cand[:, 0] * og[1] + cand[:, 1]) * og[2] + cand[:, 2]
    ulin = np.unique(lin)
    sites = np.stack([ulin // (og[1] * og[2]), (ulin // og[2]) % og[1],
                      ulin % og[2]], -1)
    return _SiteSet(sites, og), og


def _strided_conv(x, ss_in: _SiteSet, ss_out: _SiteSet, pad, w):
    pad = np.asarray(pad)
    V = len(ss_out.sites)
    out = np.zeros((V, w.shape[-1]), np.float32)
    for k in range(27):
        src = ss_out.sites * 2 - pad + _OFFS[k]
        j = ss_in.lookup(src)
        sel = j >= 0
        if sel.any():
            out[sel] += x[j[sel]] @ w[tuple(_OFFS[k])]
    return out


def _get_spw(sd, k, out_c):
    w = sd[k + ".weight"]
    if w.shape[0] == out_c and w.shape[-1] != out_c:
        w = w.transpose(1, 2, 3, 4, 0)  # spconv v2 -> mmcv
    return w


def oracle_sparse_encoder(sd, cfg, feats, coords, vmask):
    """-> dense (D', H', W', C) volume + site counts per stage."""
    pe = "pts_middle_encoder"
    sites = coords[vmask].astype(np.int64)
    x = feats[vmask].astype(np.float32)
    grid = tuple(cfg.grid_size)
    ss = _SiteSet(sites, grid)
    counts = [len(sites)]

    x = _subm_conv(x, ss, _get_spw(sd, f"{pe}.conv_input.0",
                                   cfg.encoder_base_channels))
    x = np.maximum(_bn_eval(sd, f"{pe}.conv_input.1", x), 0)

    n_stages = len(cfg.encoder_channels)
    for i, blocks in enumerate(cfg.encoder_channels):
        last_strided = i < n_stages - 1
        body = blocks[:-1] if last_strided else blocks
        for j, c in enumerate(body):
            src = f"{pe}.encoder_layers.encoder_layer{i+1}.{j}"
            ident = x
            y = _subm_conv(x, ss, _get_spw(sd, f"{src}.conv1", c))
            y = np.maximum(_bn_eval(sd, f"{src}.bn1", y), 0)
            y = _subm_conv(y, ss, _get_spw(sd, f"{src}.conv2", c))
            y = _bn_eval(sd, f"{src}.bn2", y)
            x = np.maximum(y + ident, 0)
        if last_strided:
            src = f"{pe}.encoder_layers.encoder_layer{i+1}.{len(body)}"
            pad = cfg.encoder_downsample_paddings[i]
            ss2, grid = _strided_sites(ss, pad, grid)
            x = _strided_conv(x, ss, ss2, pad,
                              _get_spw(sd, f"{src}.0", blocks[-1]))
            x = np.maximum(_bn_eval(sd, f"{src}.1", x), 0)
            ss = ss2
            counts.append(len(ss.sites))

    w = _get_spw(sd, f"{pe}.conv_out.0", cfg.encoder_out_channels)[0, 0, 0]
    x = x @ w
    x = np.maximum(_bn_eval(sd, f"{pe}.conv_out.1", x), 0)
    vol = np.zeros((*grid, cfg.encoder_out_channels), np.float32)
    vol[ss.sites[:, 0], ss.sites[:, 1], ss.sites[:, 2]] = x
    return vol, counts


def oracle_backbone_neck(sd, cfg, vol):
    """vol (D,H,W,C) -> fused (D,H,W,256) via torch conv3d."""
    pb, pn = "pts_backbone", "pts_neck"
    xt = t(vol).permute(3, 0, 1, 2)[None]  # (1, C, D, H, W)

    def bn3d(k, x):
        return (x - t(sd[k + ".running_mean"]).view(1, -1, 1, 1, 1)) \
            / torch.sqrt(t(sd[k + ".running_var"]).view(1, -1, 1, 1, 1)
                         + 1e-3) \
            * t(sd[k + ".weight"]).view(1, -1, 1, 1, 1) \
            + t(sd[k + ".bias"]).view(1, -1, 1, 1, 1)

    outs = []
    for i, n in enumerate(cfg.backbone_layers):
        s = cfg.backbone_strides[i]
        y = F.conv3d(xt, t(sd[f"{pb}.blocks.{i}.0.weight"]),
                     stride=(1, s, s), padding=(0, 1, 1))
        y = F.relu(bn3d(f"{pb}.blocks.{i}.1", y))
        for j in range(1, n + 1):
            y = F.conv3d(y, t(sd[f"{pb}.blocks.{i}.{3*j}.weight"]),
                         padding=(0, 1, 1))
            y = F.relu(bn3d(f"{pb}.blocks.{i}.{3*j+1}", y))
        outs.append(y)

    ups = []
    for i, us in enumerate(cfg.neck_upsample_strides):
        if us > 1:
            y = F.conv_transpose3d(outs[i],
                                   t(sd[f"{pn}.deblocks.{i}.0.weight"]),
                                   stride=(1, us, us))
        else:
            y = F.conv3d(outs[i], t(sd[f"{pn}.deblocks.{i}.0.weight"]))
        ups.append(F.relu(bn3d(f"{pn}.deblocks.{i}.1", y)))
    out = sum(ups)
    for j in range(3):
        out = F.conv3d(out, t(sd[f"{pn}.extra_blocks.{3*j}.weight"]),
                       padding=1)
        out = F.relu(bn3d(f"{pn}.extra_blocks.{3*j+1}", out))
    return out  # (1, 256, D, H, W)


def _sd_mha(sd, k, x_q, x_kv, num_heads):
    C = x_kv.shape[-1]
    q = x_q.transpose(0, 1)
    kv = x_kv.transpose(0, 1)
    out, _ = F.multi_head_attention_forward(
        q, q, kv, C, num_heads,
        t(sd[k + ".in_proj_weight"]), t(sd[k + ".in_proj_bias"]),
        None, None, False, 0.0,
        t(sd[k + ".out_proj.weight"]), t(sd[k + ".out_proj.bias"]),
        training=False, need_weights=False)
    return out.transpose(0, 1)


def _sd_mlp3(sd, k, x):
    x = F.relu(_sd_lin(sd, k + ".layers.0", x))
    x = F.relu(_sd_lin(sd, k + ".layers.1", x))
    return _sd_lin(sd, k + ".layers.2", x)


def _sd_branch(sd, k, x, layer_norm):
    if layer_norm:
        for s_lin, s_ln in ((0, 1), (3, 4)):
            x = F.relu(_sd_ln(sd, f"{k}.{s_ln}", _sd_lin(sd, f"{k}.{s_lin}",
                                                         x)))
        return _sd_lin(sd, f"{k}.6", x)
    for s in (0, 2):
        x = F.relu(_sd_lin(sd, f"{k}.{s}", x))
    return _sd_lin(sd, f"{k}.4", x)


def _torch_sine_embed(pos, num_feats=128, temperature=10000.0):
    scale = 2 * math.pi
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                            / num_feats)
    parts = []
    for i in range(pos.shape[-1]):
        x = pos[..., i:i + 1] * scale / dim_t
        parts.append(torch.stack((x[..., 0::2].sin(), x[..., 1::2].cos()),
                                 dim=-1).flatten(-2))
    return torch.cat(parts, dim=-1)


def _inv_sigmoid(x, eps=1e-5):
    x = x.clamp(0, 1)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


def oracle_head(sd, cfg, vol_t, fps, rnd):
    """Full eval head forward from the state_dict
    (uni3detr_head.py:422-508); vol_t (1, C, D, H, W) torch."""
    ph = "pts_bbox_head"
    dec = f"{ph}.transformer.decoder"
    nq, L, heads = cfg.num_query, cfg.num_decoder_layers, cfg.num_heads
    pc = cfg.pc_range
    tgt = t(sd[f"{ph}.tgt_embed.weight"])
    anchor = t(sd[f"{ph}.refpoint_embed.weight"])
    B = fps.shape[0]
    contents = [tgt[:nq], tgt[nq:], tgt[nq:], tgt[nq:]]
    refs0 = [anchor.unsqueeze(0).expand(B, -1, -1),
             _inv_sigmoid(t(fps))[:, :nq],
             _inv_sigmoid(t(fps))[:, nq:],
             _inv_sigmoid(t(rnd))]
    g_states, g_refs = [], []
    for g in range(4):
        x = contents[g].unsqueeze(0).expand(B, -1, -1)
        ref = refs0[g]
        states, refs_in = [], []
        for lid in range(L):
            sine = _torch_sine_embed(torch.sigmoid(ref))
            raw_pos = _sd_mlp3(sd, f"{dec}.ref_point_head", sine)
            scale = _sd_mlp3(sd, f"{dec}.query_scale", x) if lid > 0 else 1.0
            qp = scale * raw_pos
            src = f"{dec}.layers.{lid}"
            attn = _sd_mha(sd, f"{src}.attentions.0.attn", x + qp, x, heads)
            x = _sd_ln(sd, f"{src}.norms.0", x + attn)
            # UniCrossAtten (uni3detr_transformer.py:215-360)
            q = x + qp
            attw = torch.sigmoid(
                _sd_lin(sd, f"{src}.attentions.1.attention_weights", q))
            grid = (torch.sigmoid(ref) - 0.5) * 2.0
            samp = F.grid_sample(vol_t, grid.view(B, 1, 1, -1, 3),
                                 align_corners=False)
            samp = samp[:, :, 0, 0].permute(0, 2, 1)
            ca = _sd_lin(sd, f"{src}.attentions.1.output_proj", samp * attw)
            pe = f"{src}.attentions.1.position_encoder"
            pos = F.relu(_sd_ln(sd, f"{pe}.1",
                                _sd_lin(sd, f"{pe}.0", ref)))
            pos = F.relu(_sd_ln(sd, f"{pe}.4",
                                _sd_lin(sd, f"{pe}.3", pos)))
            x = _sd_ln(sd, f"{src}.norms.1", ca + x + pos)
            y = _sd_lin(sd, f"{src}.ffns.0.layers.1",
                        F.relu(_sd_lin(sd, f"{src}.ffns.0.layers.0.0", x)))
            x = _sd_ln(sd, f"{src}.norms.2", x + y)
            states.append(x)
            refs_in.append(ref)
            tmp = _sd_branch(sd, f"{ph}.reg_branches.{lid}", x, False)
            ref = torch.cat([tmp[..., 0:2] + ref[..., 0:2],
                             tmp[..., 4:5] + ref[..., 2:3]], -1).detach()
        g_states.append(states)
        g_refs.append(refs_in)
    all_cls, all_box, all_iou = [], [], []
    for l in range(L):
        h = torch.cat([g_states[g][l] for g in range(4)], dim=1)
        r = torch.cat([g_refs[g][l] for g in range(4)], dim=1)
        cls = _sd_branch(sd, f"{ph}.cls_branches.{l}", h, True)
        tmp = _sd_branch(sd, f"{ph}.reg_branches.{l}", h, False)
        iou = _sd_branch(sd, f"{ph}.iou_branches.{l}", h, False)[..., 0]
        xy = torch.sigmoid(tmp[..., 0:2] + r[..., 0:2])
        z = torch.sigmoid(tmp[..., 4:5] + r[..., 2:3])
        cx = xy[..., 0:1] * (pc[3] - pc[0]) + pc[0]
        cy = xy[..., 1:2] * (pc[4] - pc[1]) + pc[1]
        cz = z * (pc[5] - pc[2]) + pc[2]
        box = torch.cat([cx, cy, tmp[..., 2:4], cz, tmp[..., 5:]], dim=-1)
        all_cls.append(cls)
        all_box.append(box)
        all_iou.append(iou)
    return (torch.stack(all_cls), torch.stack(all_box),
            torch.stack(all_iou))


# ---------------------------------------------------------------------------
# helpers shared by the parity tests
# ---------------------------------------------------------------------------

def clustered_cloud(rng, cfg, n_clusters=24, max_cells=9):
    """Solid voxel-aligned boxes: contiguous occupancy (like real
    surfaces) whose site count SHRINKS under strided downsampling —
    isolated voxels would expand up to 8x per stride-2 stage and blow the
    per-stage voxel budgets the gather path truncates to."""
    lo = np.asarray(cfg.pc_range[:3])
    vs = np.asarray(cfg.voxel_size)
    D, H, W = cfg.grid_size
    lim = np.asarray([W, H, D])  # (x, y, z) cells
    all_cells = []
    for _ in range(n_clusters):
        ext = rng.randint(4, max_cells + 1, 3)
        c0 = (rng.rand(3) * np.maximum(lim - ext - 1, 1)).astype(np.int64)
        ax = [np.arange(c0[i], min(c0[i] + ext[i], lim[i] - 1))
              for i in range(3)]
        bx, by, bz = np.meshgrid(*ax, indexing="ij")
        all_cells.append(np.stack([bx.ravel(), by.ravel(), bz.ravel()], -1))
    cells = np.unique(np.concatenate(all_cells), axis=0)
    pts = (cells + 0.5) * vs + lo
    extra = rng.rand(len(pts), cfg.in_point_features - 3)
    return np.concatenate([pts, extra], -1).astype(np.float32)


def run_full_parity(cfg, rng, atol):
    sd = make_state_dict(cfg, rng)
    variables = import_torch_state_dict(sd, cfg)

    pts = clustered_cloud(rng, cfg)[None]  # (1, P, C)
    mask = np.ones(pts.shape[:2], bool)
    rnd = rng.rand(1, cfg.num_query, 3).astype(np.float32)

    # ours: whole detector in one jitted apply
    model = Uni3DETR(cfg)
    outs = jax.jit(
        lambda v, p, m, r: model.apply(v, p, m, train=False,
                                       random_points=r))(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(rnd))

    # oracle: shared voxelizer/FPS outputs (tested elsewhere), then
    # sd-reading torch/numpy modules
    from uni3detr_tpu.ops.voxelize import hard_voxelize
    from uni3detr_tpu.ops.fps import farthest_point_sample
    from uni3detr_tpu.models.detector import _minmax_norm
    feats, coords, vmask = hard_voxelize(
        jnp.asarray(pts), jnp.asarray(mask),
        pc_range=tuple(cfg.pc_range), voxel_size=tuple(cfg.voxel_size),
        grid_size=tuple(cfg.grid_size),
        max_points=cfg.max_points_per_voxel,
        max_voxels=cfg.max_voxels_test)
    xyz = jnp.asarray(pts[..., :3])
    idx1 = farthest_point_sample(xyz, jnp.asarray(mask), cfg.num_query)
    fps1 = _minmax_norm(jnp.take_along_axis(xyz, idx1[..., None], axis=1))
    vc = coords[..., ::-1].astype(jnp.float32)
    vc = jnp.where(vmask[..., None], vc, 0.0)
    idx2 = farthest_point_sample(vc, vmask, cfg.num_query)
    fps2 = _minmax_norm(jnp.take_along_axis(vc, idx2[..., None], axis=1))
    fps = np.asarray(jnp.concatenate([fps1, fps2], axis=1))

    vol, counts = oracle_sparse_encoder(
        sd, cfg, np.asarray(feats[0]), np.asarray(coords[0]),
        np.asarray(vmask[0]))
    # the gather path truncates to per-stage budgets; the oracle doesn't —
    # the cloud must stay under budget for the comparison to be exact
    caps = cfg.encoder_budget_caps or (1 << 30,) * 3
    budgets = [cfg.max_voxels_test] + [
        max(min(int(cfg.max_voxels_test * s), c), 256)
        for s, c in zip(cfg.encoder_budget_shrink[:len(counts) - 1], caps)]
    for c, b in zip(counts, budgets):
        assert c < b, f"oracle site count {c} exceeds budget {b}"
    with torch.no_grad():
        fused = oracle_backbone_neck(sd, cfg, vol)
        cls_o, box_o, iou_o = oracle_head(sd, cfg, fused,
                                          fps.astype(np.float32), rnd)

    np.testing.assert_allclose(np.asarray(outs["all_cls_scores"]),
                               cls_o.numpy(), atol=atol)
    np.testing.assert_allclose(np.asarray(outs["all_bbox_preds"]),
                               box_o.numpy(), atol=atol)
    np.testing.assert_allclose(np.asarray(outs["all_iou_preds"]),
                               iou_o.numpy(), atol=atol)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_import_structure_tiny():
    cfg = TINY_SYNTHETIC
    rng = np.random.RandomState(0)
    sd = make_state_dict(cfg, rng)
    variables = import_torch_state_dict(sd, cfg)
    model = Uni3DETR(cfg)
    pts = jnp.zeros((1, 64, cfg.in_point_features), jnp.float32)
    mask = jnp.ones((1, 64), bool)
    rnd = jnp.full((1, cfg.num_query, 3), 0.5, jnp.float32)
    ref_vars = model.init(jax.random.PRNGKey(0), pts, mask, train=False,
                          random_points=rnd)
    missing, extra, mismatched = check_structure(variables, ref_vars)
    assert not missing, missing[:10]
    assert not extra, extra[:10]
    assert not mismatched, mismatched[:10]


@pytest.mark.parametrize("preset", ["sunrgbd", "kitti"])
def test_import_structure_real_presets_eval_shape(preset):
    """Structural check at the REAL preset scale via eval_shape (no
    FLOPs — validates every leaf path and shape of the mapping)."""
    cfg = dataclasses.replace(SUNRGBD if preset == "sunrgbd" else KITTI_CAR,
                              compute_dtype="float32")
    rng = np.random.RandomState(1)
    sd = make_state_dict(cfg, rng)
    variables = import_torch_state_dict(sd, cfg)
    model = Uni3DETR(cfg)
    pts = jax.ShapeDtypeStruct((1, 1024, cfg.in_point_features),
                               jnp.float32)
    mask = jax.ShapeDtypeStruct((1, 1024), jnp.bool_)
    rnd = jax.ShapeDtypeStruct((1, cfg.num_query, 3), jnp.float32)
    ref_vars = jax.eval_shape(
        lambda p, m, r: model.init(jax.random.PRNGKey(0), p, m,
                                   train=False, random_points=r),
        pts, mask, rnd)
    missing, extra, mismatched = check_structure(variables, ref_vars)
    assert not missing, missing[:10]
    assert not extra, extra[:10]
    assert not mismatched, mismatched[:10]


def test_spconv_v2_layout_auto_detected():
    cfg = TINY_SYNTHETIC
    rng = np.random.RandomState(2)
    sd1 = make_state_dict(cfg, rng, spconv_v2=False)
    rng = np.random.RandomState(2)
    sd2 = make_state_dict(cfg, rng, spconv_v2=True)
    v1 = import_torch_state_dict(sd1, cfg)
    v2 = import_torch_state_dict(sd2, cfg)
    jax.tree_util.tree_map(np.testing.assert_array_equal, v1, v2)


@pytest.mark.slow
def test_full_forward_parity_sunrgbd_real_scale():
    """Full-detector forward parity at the real SUN RGB-D config: grid
    [128,320,320], 3 decoder layers, nq=300, C=256, eval query groups.
    fp32 (the reference runs the matched path fp32 too)."""
    cfg = dataclasses.replace(SUNRGBD, compute_dtype="float32")
    run_full_parity(cfg, np.random.RandomState(10), atol=2e-3)


@pytest.mark.slow
def test_full_forward_parity_kitti_9layer():
    """9-decoder-layer KITTI shape: real depth (9 layers), channels and
    nq; the H/W grid is reduced 4x (1600x1408 -> 400x352) to keep the
    single-core CPU oracle tractable — grid extent is orthogonal to
    weight mapping (the z extent, kernels and strides are real)."""
    cfg = dataclasses.replace(
        KITTI_CAR, compute_dtype="float32",
        grid_size=(41, 512, 384),  # H/W div by 32 like the real grid
        pc_range=(0.0, -12.8, -3.0, 19.2, 12.8, 1.0),
        max_voxels_test=12000, num_points=9000)
    # 9 iterated refinement layers amplify fp32 reduction-order noise:
    # observed max |diff| 4.5e-3 on <0.01% of logits (XLA vs torch matmul
    # ordering), so the tolerance is wider than the 3-layer SUN RGB-D test
    run_full_parity(cfg, np.random.RandomState(11), atol=1e-2)
