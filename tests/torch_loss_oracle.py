"""Torch transcription of the REFERENCE training math, used as the oracle
for loss/gradient parity tests (VERDICT r3 item 1).

This is an independent line-by-line transcription of
/root/reference/projects/mmdet3d_plugin/models/dense_heads/uni3detr_head.py
(loss_single :617-698, _get_target_single :510-564, loss :716-793),
core/bbox/assigners/hungarian_assigner_3d.py (:53-160),
core/bbox/match_costs/match_cost.py (BBox3DL1Cost :10-31, IoU3DCost :86-97,
mmdet FocalLossCost), models/losses/rdiouloss.py (iou3d_loss :93-102,
SoftFocalLoss :162-223, weight.mean(-1) :150-151) and core/bbox/util.py
(normalize_bbox/denormalize_bbox :8-80, >=1.0 branch) — written against
torch/numpy/scipy so any slip in the JAX implementation shows up as a
numeric mismatch, not a shared bug.

All functions are differentiable torch except the exact rotated-3D IoU
(numpy Sutherland–Hodgman): the reference only uses it DETACHED
(iou3d_true, uni3detr_head.py:695), so no gradient flows through it there
either.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F
from scipy.optimize import linear_sum_assignment


# ---------------------------------------------------------------------------
# box code (core/bbox/util.py:8-80, mmdet3d >= 1.0 branch)
# ---------------------------------------------------------------------------

def normalize_bbox_t(boxes):
    """(N, 7|9) gravity-centered -> (N, 8|10) normalized code."""
    cx, cy, cz = boxes[..., 0:1], boxes[..., 1:2], boxes[..., 2:3]
    l = (boxes[..., 3:4] + 1e-5).log()
    w = (boxes[..., 4:5] + 1e-5).log()
    h = (boxes[..., 5:6] + 1e-5).log()
    rot = -boxes[..., 6:7] - math.pi / 2
    parts = [cx, cy, l, w, cz, h, rot.sin(), rot.cos()]
    if boxes.shape[-1] > 7:
        parts.append(boxes[..., 7:9])
    return torch.cat(parts, dim=-1)


def denormalize_bbox_t(code):
    """(N, 8|10) -> (N, 7|9)."""
    rot = torch.atan2(code[..., 6:7], code[..., 7:8])
    rot = -rot - math.pi / 2
    cx, cy, cz = code[..., 0:1], code[..., 1:2], code[..., 4:5]
    l = code[..., 2:3].exp()
    w = code[..., 3:4].exp()
    h = code[..., 5:6].exp()
    parts = [cx, cy, cz, l, w, h, rot]
    if code.shape[-1] > 8:
        parts.append(code[..., 8:10])
    return torch.cat(parts, dim=-1)


# ---------------------------------------------------------------------------
# IoUs (mmdet3d iou3d_calculator semantics)
# ---------------------------------------------------------------------------

def _limit_period_t(val, offset=0.5, period=math.pi):
    return val - torch.floor(val / period + offset) * period


def _nearest_bev_t(boxes):
    """mmdet3d ``nearest_bev``: (N, >=7) -> axis-aligned (N, 4) xyxy."""
    rot = torch.abs(_limit_period_t(boxes[:, 6]))
    cond = rot > math.pi / 4
    dx = torch.where(cond, boxes[:, 4], boxes[:, 3])
    dy = torch.where(cond, boxes[:, 3], boxes[:, 4])
    return torch.stack([boxes[:, 0] - dx / 2, boxes[:, 1] - dy / 2,
                        boxes[:, 0] + dx / 2, boxes[:, 1] + dy / 2], -1)


def _iou2d_xyxy_t(b1, b2, eps=1e-6):
    """b1/b2 same shape (..., 4) -> elementwise IoU (mmdet bbox_overlaps
    aligned mode, union clamped at eps)."""
    lt = torch.maximum(b1[..., :2], b2[..., :2])
    rb = torch.minimum(b1[..., 2:], b2[..., 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    return inter / (a1 + a2 - inter).clamp(min=eps)


def nearest_iou_aligned_t(pred, tgt):
    """bbox_overlaps_nearest_3d(..., is_aligned=True): a 2D BEV IoU."""
    return _iou2d_xyxy_t(_nearest_bev_t(pred), _nearest_bev_t(tgt))


def nearest_iou_pair_t(pred, gt):
    """(Q, .) x (G, .) -> (Q, G) pairwise nearest-BEV IoU."""
    b1 = _nearest_bev_t(pred)[:, None, :]
    b2 = _nearest_bev_t(gt)[None, :, :]
    return _iou2d_xyxy_t(b1, b2)


# exact rotated 3D IoU (numpy, used only for the DETACHED iou3d_true) ------

def _np_corners_bev(b):
    """(N, 7) -> (N, 4, 2) CCW BEV corners."""
    cx, cy, hx, hy, yaw = b[:, 0], b[:, 1], b[:, 3] / 2, b[:, 4] / 2, b[:, 6]
    c, s = np.cos(yaw), np.sin(yaw)
    ox = np.stack([hx, -hx, -hx, hx], -1)
    oy = np.stack([hy, hy, -hy, -hy], -1)
    x = cx[:, None] + ox * c[:, None] - oy * s[:, None]
    y = cy[:, None] + ox * s[:, None] + oy * c[:, None]
    return np.stack([x, y], -1)


def _np_clip_poly(poly, a, b):
    """Clip polygon (list of xy) by half-plane left of a->b."""
    out = []
    n = len(poly)
    for i in range(n):
        p, q = poly[i], poly[(i + 1) % n]
        dp = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
        dq = (b[0] - a[0]) * (q[1] - a[1]) - (b[1] - a[1]) * (q[0] - a[0])
        if dp >= 0:
            out.append(p)
        if (dp >= 0) != (dq >= 0):
            t = dp / (dp - dq)
            out.append(p + t * (q - p))
    return out


def _np_poly_area(poly):
    if len(poly) < 3:
        return 0.0
    P = np.asarray(poly)
    x, y = P[:, 0], P[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def np_rotated_iou3d_aligned_bottom(pred, tgt):
    """Elementwise exact rotated 3D IoU with z treated as the BOTTOM
    (mmdet3d bbox_overlaps_3d coordinate='lidar' on gravity-centered
    inputs — the reference's own mis-wrap, uni3detr_head.py:695)."""
    pred = np.asarray(pred, np.float64)
    tgt = np.asarray(tgt, np.float64)
    c1, c2 = _np_corners_bev(pred), _np_corners_bev(tgt)
    out = np.zeros(len(pred))
    for i in range(len(pred)):
        poly = [c1[i, j] for j in range(4)]
        for j in range(4):
            poly = _np_clip_poly(poly, c2[i, j], c2[i, (j + 1) % 4])
            if not poly:
                break
        inter_bev = _np_poly_area(poly)
        hi = min(pred[i, 2] + pred[i, 5], tgt[i, 2] + tgt[i, 5]) \
            - max(pred[i, 2], tgt[i, 2])
        inter = inter_bev * max(hi, 0.0)
        v1 = pred[i, 3] * pred[i, 4] * pred[i, 5]
        v2 = tgt[i, 3] * tgt[i, 4] * tgt[i, 5]
        out[i] = inter / max(v1 + v2 - inter, 1e-8)
    return out


# ---------------------------------------------------------------------------
# Hungarian assignment (hungarian_assigner_3d.py:53-160)
# ---------------------------------------------------------------------------

def focal_cost_t(cls_pred, gt_labels, weight, alpha=0.25, gamma=2.0,
                 eps=1e-12):
    """mmdet FocalLossCost."""
    p = cls_pred.sigmoid()
    neg = -(1 - p + eps).log() * (1 - alpha) * p.pow(gamma)
    pos = -(p + eps).log() * alpha * (1 - p).pow(gamma)
    return (pos[:, gt_labels] - neg[:, gt_labels]) * weight


def torch_assign(cls_pred, bbox_pred, gt, gl, cfg, return_cost=False):
    """One image: (Q, ncls), (Q, code), (G, 7|9), (G,) -> assigned gt index
    per query (-1 = background). Per-group scipy LSA with gt tiling."""
    norm_gt = normalize_bbox_t(gt)
    dec = denormalize_bbox_t(bbox_pred)
    cls_cost = focal_cost_t(cls_pred, gl, cfg.cls_cost_weight)
    reg_cost = torch.cdist(bbox_pred[:, :8], norm_gt[:, :8], p=1) \
        * cfg.reg_cost_weight
    iou_cost = (1 - nearest_iou_pair_t(dec, gt)) * cfg.iou_cost_weight
    cost = (cls_cost + reg_cost + iou_cost).detach().numpy()
    nq = cfg.num_query
    ng = cost.shape[0] // nq
    G = gt.shape[0]
    assigned = np.full(cost.shape[0], -1, np.int64)
    for g in range(ng):
        c = np.tile(cost[g * nq:(g + 1) * nq], (1, cfg.gt_repeattimes))
        r, col = linear_sum_assignment(c)
        assigned[g * nq + r] = col % G
    if return_cost:
        return assigned, cost
    return assigned


def assignment_total_cost(cost, assigned):
    """Sum of cost over matched (row, gt) pairs — the objective scipy
    minimizes (duplicate tiled columns share the original's costs)."""
    rows = np.nonzero(assigned >= 0)[0]
    return float(cost[rows, assigned[rows]].sum())


# ---------------------------------------------------------------------------
# loss_single (uni3detr_head.py:617-698) + loss (:716-793)
# ---------------------------------------------------------------------------

def soft_focal_t(pred, labels, score, num_classes, avg_factor,
                 alpha=0.25, gamma=2.0):
    """rdiouloss.py:162-184 with label_weights=1."""
    ps = pred.sigmoid()
    oh = torch.zeros(pred.shape[0], num_classes + 1)
    oh.scatter_(1, labels[:, None], 1.0)
    oh = oh[:, :-1]
    ts = (oh > 0).float() * score[:, None]
    pt = ts - ps
    fw = ((1 - alpha) + (2 * alpha - 1) * ts) * pt.pow(gamma)
    loss = F.binary_cross_entropy_with_logits(pred, ts,
                                              reduction="none") * fw
    return loss.sum() / avg_factor


def torch_loss_single(cls_scores, bbox_preds, iou_preds, gt_list, gl_list,
                      cfg, assign_override=None, unc_preds=None):
    """One decoder layer over the batch: (B, Q, .) torch tensors + exact
    (unpadded) GT lists. Returns (component dict, per-image assignment).

    ``assign_override``: per-image (Q,) assigned-gt arrays to use instead
    of this oracle's own matching (the assignment is detached data in the
    reference too, hungarian_assigner_3d.py:124 — injecting the other
    implementation's near-tie choice lets the loss math be compared
    exactly when fp noise flips degenerate matchings).

    ``unc_preds`` (B, Q, ncls+1): the OV head's uncertainty branch
    (uni3detr_head_clip.py:696-748): gathered at the target label
    (background rows take the last column), clipped at min 0.01; the L1
    bbox weights are multiplied by sqrt(2)*exp(-sigma) and a
    loss_consistency = sigma.mean() term is added."""
    B, Q, ncls = cls_scores.shape
    code = bbox_preds.shape[-1]
    labels, bbox_targets, bbox_weights, assigns = [], [], [], []
    num_total_pos = 0
    for i in range(B):
        a = assign_override[i] if assign_override is not None else \
            torch_assign(cls_scores[i], bbox_preds[i], gt_list[i],
                         gl_list[i], cfg)
        pos = a >= 0
        num_total_pos += int(pos.sum())
        lab = torch.full((Q,), cfg.num_classes, dtype=torch.long)
        lab[pos] = gl_list[i][a[pos]]
        bt = torch.zeros(Q, gt_list[i].shape[-1])
        bt[pos] = gt_list[i][a[pos]]
        bw = torch.zeros(Q, code)
        bw[pos] = 1.0
        labels.append(lab)
        bbox_targets.append(bt)
        bbox_weights.append(bw)
        assigns.append(a)
    labels = torch.cat(labels)
    bbox_targets = torch.cat(bbox_targets)
    bbox_weights = torch.cat(bbox_weights)

    cls_scores = cls_scores.reshape(-1, ncls)
    cls_avg_factor = max(num_total_pos, 1)

    bbox_preds = bbox_preds.reshape(-1, code)
    normalized_bbox_targets = normalize_bbox_t(bbox_targets)
    bboxes3d = denormalize_bbox_t(bbox_preds)

    iou3d = nearest_iou_aligned_t(bboxes3d, bbox_targets)
    z1 = bboxes3d[:, 2] - bboxes3d[:, 5] / 2
    z2 = bboxes3d[:, 2] + bboxes3d[:, 5] / 2
    z3 = bbox_targets[:, 2] - bbox_targets[:, 5] / 2
    z4 = bbox_targets[:, 2] + bbox_targets[:, 5] / 2
    iou_z = (torch.minimum(z2, z4) - torch.maximum(z1, z3)).clamp(min=0) \
        / (torch.maximum(z2, z4) - torch.minimum(z1, z3))
    iou3d_dec = (iou3d + iou_z) / 2

    loss_cls = cfg.loss_cls_weight * soft_focal_t(
        cls_scores, labels, iou3d_dec, cfg.num_classes, cls_avg_factor)

    ntp = float(max(num_total_pos, 1))

    isnotnan = torch.isfinite(normalized_bbox_targets).all(dim=-1)
    cw = torch.tensor(cfg.code_weights, dtype=torch.float32)
    bbox_weights = bbox_weights * cw

    loss_consistency = None
    unc_w = 1.0
    if unc_preds is not None:
        # uni3detr_head_clip.py:696-697: gather at target label, clip,
        # sqrt(2)*exp(-sigma) L1 weighting + consistency mean (:748)
        u = unc_preds.reshape(-1, unc_preds.shape[-1])
        u = u[torch.arange(labels.shape[0]), labels].clip(min=0.01)
        unc_w = math.sqrt(2) * torch.exp(-u[:, None])
        loss_consistency = u.mean()

    l1 = (bbox_preds[isnotnan, :10] -
          normalized_bbox_targets[isnotnan, :10]).abs() \
        * (bbox_weights[isnotnan, :10]
           * (unc_w if unc_preds is None else unc_w[isnotnan]))
    loss_bbox = cfg.loss_bbox_weight * l1.sum() / ntp

    loss_iou_z = 1 - iou_z[isnotnan]
    iou_term = 1 - nearest_iou_aligned_t(bboxes3d[isnotnan],
                                         bbox_targets[isnotnan])
    loss_iou = cfg.loss_iou_weight \
        * (iou_term * bbox_weights[isnotnan].mean(-1)).sum() / ntp
    loss_iou = loss_iou \
        + (loss_iou_z * bbox_weights[isnotnan, 0]).sum() / ntp

    iou_preds = iou_preds.reshape(-1)
    iou3d_true = torch.from_numpy(np_rotated_iou3d_aligned_bottom(
        bboxes3d.detach().numpy(), bbox_targets.detach().numpy())).float()
    loss_iou_pred = (F.binary_cross_entropy_with_logits(
        iou_preds, iou3d_true, reduction="none")
        * bbox_weights[isnotnan, 0]).sum() / ntp * 1.2

    comps = {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
             "loss_iou": loss_iou, "loss_iou_pred": loss_iou_pred}
    if loss_consistency is not None:
        comps["loss_consistency"] = loss_consistency
    return (comps, assigns)


def torch_loss(all_cls, all_box, all_iou, gt_list, gl_list, cfg,
               assign_overrides=None, all_unc=None):
    """All decoder layers; returns (total, per-key dict, assignments).
    ``assign_overrides``: per-layer list of per-image assignments;
    ``all_unc``: per-layer OV uncertainty predictions (L, B, Q, ncls+1)."""
    L = all_cls.shape[0]
    logs, assigns = {}, []
    total = torch.zeros(())
    for l in range(L):
        comps, a = torch_loss_single(
            all_cls[l], all_box[l], all_iou[l], gt_list, gl_list, cfg,
            assign_override=None if assign_overrides is None
            else assign_overrides[l],
            unc_preds=None if all_unc is None else all_unc[l])
        prefix = "" if l == L - 1 else f"d{l}."
        for k, v in comps.items():
            logs[prefix + k] = v
            total = total + v
        assigns.append(a)
    return total, logs, assigns
