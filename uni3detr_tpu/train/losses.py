"""Set-matching losses for Uni3DETR, fully on device.

Capability parity with the reference loss stack
(uni3detr_head.py:510-793 + rdiouloss.py + hungarian_assigner_3d.py):

- Hungarian costs: mmdet FocalLossCost (w=2), BBox3DL1Cost on the first 8
  code dims (w=0.25), IoU3DCost = 1 - nearest-BEV IoU (w=1.2)
  (hungarian_assigner_3d.py:110-121, match_cost.py:86-97);
- per-group matching with optional GT column tiling (gt_repeattimes);
- SoftFocalLoss classification with the IoU-aware quality target
  iou3d_dec = (nearest_bev_iou + z_iou)/2 (uni3detr_head.py:671-676,
  rdiouloss.py:162-184);
- weighted L1 on the normalized code with code_weights
  (uni3detr_head.py:684-687);
- IoU loss = (1 - nearest-BEV-aligned IoU) + (1 - z-IoU) term
  (rdiouloss.py:93-102, uni3detr_head.py:689-691);
- IoU-prediction BCE against the detached exact rotated 3D IoU x 1.2
  (uni3detr_head.py:694-696).

Normalizers follow the reference's cross-rank ``reduce_mean`` semantics:
under a sharded batch the sums here are global sums, and
S_global / P_global equals the DDP-averaged sum of per-rank S_r / mean(P).
All GT tensors are padded with validity masks; padded rows produce zero
loss by construction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geom.boxes import encode_boxes, decode_boxes
from ..geom.iou import (
    nearest_bev_iou, nearest_bev_iou_aligned, z_interval_iou_aligned,
    iou3d_rotated, iou3d_rotated_aligned, axis_aligned_iou3d, rdiou,
)
from ..ops.matching import match_queries_to_gt
from ..models.config import Uni3DETRConfig


def focal_cls_cost(cls_logits, gt_labels, alpha=0.25, gamma=2.0, eps=1e-12):
    """mmdet FocalLossCost: (Q, ncls) x (Gt,) -> (Q, Gt)."""
    p = jax.nn.sigmoid(cls_logits)
    neg = -jnp.log(1 - p + eps) * (1 - alpha) * p ** gamma
    pos = -jnp.log(p + eps) * alpha * (1 - p) ** gamma
    return (pos - neg)[:, gt_labels]


def soft_focal_cls_cost(cls_logits, gt_labels, iou3d, alpha=0.25,
                        gamma=2.0, eps=1e-12):
    """SoftFocalLossCost (match_cost.py:101-128): the class probability is
    modulated by iou3d^0.001 before the focal transform.

    cls_logits (Q, ncls); gt_labels (Gt,); iou3d (Q, Gt) pairwise IoU of
    decoded boxes vs GTs. Returns (Q, Gt)."""
    p = jax.nn.sigmoid(cls_logits)[:, gt_labels]       # (Q, Gt)
    pi = p * jnp.power(jnp.maximum(iou3d, eps), 0.001)
    neg = -jnp.log(1 - pi + eps) * (1 - alpha) * pi ** gamma
    pos = -jnp.log(pi + eps) * alpha * (1 - pi) ** gamma
    return pos - neg


def soft_focal_loss(logits, labels, quality, num_classes,
                    alpha=0.25, gamma=2.0):
    """IoU-aware soft focal loss, elementwise sum over classes.

    logits (N, ncls); labels (N,) with ``num_classes`` = background;
    quality (N,) in [0, 1]. Returns per-row loss (N,).
    """
    p = jax.nn.sigmoid(logits)
    onehot = jax.nn.one_hot(labels, num_classes + 1)[:, :num_classes]
    t = onehot * quality[:, None]
    pt = t - p
    focal_w = ((1 - alpha) + (2 * alpha - 1) * t) * pt ** 2 if gamma == 2.0 \
        else ((1 - alpha) + (2 * alpha - 1) * t) * jnp.abs(pt) ** gamma
    bce = jnp.maximum(logits, 0) - logits * t + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.sum(bce * focal_w, axis=-1)


def rdiou_penalty(pred, target):
    """1 - clamp(rdiou - u, -1, 1): the shared RDIoU cost/loss formula
    (rd_iou_loss, rdiouloss.py:12-32; RDIoUCost, match_cost.py:72-83).
    Broadcasts over leading dims; boxes are fed as-is, matching the
    reference (get_rdiou exps dims 3:6 whatever representation arrives)."""
    u, rd = rdiou(pred, target)
    return 1.0 - jnp.clip(rd - u, -1.0, 1.0)


def iou_match_cost(decoded, bbox_preds, gt_boxes, norm_gt,
                   cfg: Uni3DETRConfig):
    """The IoU slot of the Hungarian cost (Q, Gt), per cfg.iou_cost_type.

    Mirrors the registered reference costs exactly, including their
    sign conventions (match_cost.py:35-102):
    - iou3d: 1 - nearest-BEV IoU on decoded boxes (IoU3DCost:89-102);
    - rotated_iou3d: +IoU x weight, decoded boxes (RotatedIoU3DCost:35-58
      returns the raw diff_iou_rotated_3d, center-z, without negation);
    - axis_aligned_iou3d: -IoU x weight (AxisAlignedIoU3DCost:61-70);
    - rdiou: the RDIoU penalty on DECODED boxes (RDIoUCost:72-83; the
      assigner call site hungarian_assigner_3d.py:120 passes bboxes3d /
      gt_bboxes, i.e. decoded/raw boxes — same as the rdiou loss path).
    """
    t = cfg.iou_cost_type
    if t == "iou3d":
        return 1.0 - nearest_bev_iou(decoded, gt_boxes)
    if t == "rotated_iou3d":
        return iou3d_rotated(decoded[:, :7], gt_boxes[:, :7],
                             z_origin="center")
    if t == "axis_aligned_iou3d":
        return -axis_aligned_iou3d(decoded[:, :7], gt_boxes[:, :7])
    if t == "rdiou":
        return rdiou_penalty(decoded[:, None, :7], gt_boxes[None, :, :7])
    raise ValueError(f"unknown iou_cost_type {t!r}")


def hungarian_assign(cls_scores, bbox_preds, gt_boxes, gt_labels, gt_mask,
                     cfg: Uni3DETRConfig):
    """Per-sample grouped assignment. Shapes: cls (Q, ncls),
    bbox (Q, code), gt (Gt, 7|9) gravity-centered. Returns (Q,) int32."""
    norm_gt = encode_boxes(gt_boxes)                # (Gt, 8|10)
    decoded = decode_boxes(bbox_preds)              # (Q, 7|9)
    if cfg.cls_cost_type == "soft_focal":
        cls_cost = soft_focal_cls_cost(
            cls_scores, gt_labels,
            nearest_bev_iou(decoded, gt_boxes)) * cfg.cls_cost_weight
    else:
        cls_cost = focal_cls_cost(cls_scores, gt_labels) \
            * cfg.cls_cost_weight
    reg_cost = jnp.sum(
        jnp.abs(bbox_preds[:, None, :8] - norm_gt[None, :, :8]),
        axis=-1) * cfg.reg_cost_weight
    iou_cost = iou_match_cost(decoded, bbox_preds, gt_boxes, norm_gt, cfg) \
        * cfg.iou_cost_weight
    cost = cls_cost + reg_cost + iou_cost
    cost = jnp.where(jnp.isfinite(cost), cost, 1e4)
    # assignment is non-differentiable (reference detaches the cost,
    # hungarian_assigner_3d.py:124); also keeps tangents out of the
    # Pallas solver, which has no JVP rule
    cost = jax.lax.stop_gradient(cost)
    return match_queries_to_gt(cost, gt_mask, cfg.num_query,
                               cfg.gt_repeattimes, method=cfg.matcher,
                               phases=cfg.matcher_phases)


def _layer_loss(cls_scores, bbox_preds, iou_preds, gt_boxes, gt_labels,
                gt_mask, cfg: Uni3DETRConfig, unc_preds=None):
    """Loss of one decoder layer over the batch. Shapes (B, Q, .).

    ``unc_preds`` (B, Q, ncls+1): OV uncertainty branch — weights the L1
    loss by sqrt(2)*exp(-sigma) and adds a consistency term sigma.mean()
    (uni3detr_head_clip.py:696-748)."""
    B, Q, ncls = cls_scores.shape
    assigned = jax.vmap(
        lambda c, b, gb, gl, gm: hungarian_assign(c, b, gb, gl, gm, cfg))(
            cls_scores, bbox_preds, gt_boxes, gt_labels, gt_mask)
    pos = assigned >= 0                              # (B, Q)
    safe = jnp.where(pos, assigned, 0)
    labels = jnp.where(
        pos, jnp.take_along_axis(gt_labels, safe, axis=1), cfg.num_classes)
    tgt = jnp.take_along_axis(gt_boxes, safe[..., None], axis=1)
    tgt = jnp.where(pos[..., None], tgt, 0.0)        # (B, Q, 7|9)

    decoded = decode_boxes(bbox_preds)
    iou_bev = nearest_bev_iou_aligned(decoded, tgt)
    iou_z = z_interval_iou_aligned(decoded, tgt)
    quality = (iou_bev + iou_z) * 0.5                # iou3d_dec

    num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)

    loss_cls = soft_focal_loss(
        cls_scores.reshape(-1, ncls), labels.reshape(-1),
        quality.reshape(-1), cfg.num_classes)
    loss_cls = jnp.sum(loss_cls) / num_pos * cfg.loss_cls_weight

    norm_tgt = encode_boxes(tgt)
    cw = jnp.asarray(cfg.code_weights, jnp.float32)
    l1 = jnp.abs(bbox_preds - norm_tgt) * cw * pos[..., None]
    l1 = jnp.where(jnp.isfinite(l1), l1, 0.0)
    loss_consistency = None
    if unc_preds is not None:
        sel = jnp.take_along_axis(unc_preds, labels[..., None], axis=-1)
        sel = jnp.clip(sel[..., 0], 0.01, None)           # (B, Q)
        l1 = l1 * (jnp.sqrt(2.0) * jnp.exp(-sel))[..., None]
        loss_consistency = jnp.mean(sel)
    loss_bbox = jnp.sum(l1) / num_pos * cfg.loss_bbox_weight

    # the loss_iou slot is config-built in the reference
    # (uni3detr_head.py:356, applied at :690 on decoded boxes); the z-IoU
    # term (:689-691) is added regardless of which loss fills the slot
    if cfg.iou_loss_type == "iou3d":
        iou_term = 1.0 - iou_bev                       # rdiouloss.py:95-102
    elif cfg.iou_loss_type == "rotated_iou3d":
        iou_term = 1.0 - iou3d_rotated_aligned(        # mmdet3d RotatedIoU3D
            decoded[..., :7], tgt[..., :7], z_origin="center")
    elif cfg.iou_loss_type == "rdiou":
        iou_term = rdiou_penalty(decoded[..., :7], tgt[..., :7])
    else:
        raise ValueError(f"unknown iou_loss_type {cfg.iou_loss_type!r}")
    # the reference's IoU3DLoss/RDIoULoss collapse the (rows, code) weight
    # by weight.mean(-1) (rdiouloss.py:150-151, :80-81): positive rows
    # weigh mean(code_weights), not 1 (all shipped configs use all-ones
    # code_weights where this is a no-op; exact for custom weights).
    # The z-IoU and IoU-pred terms use bbox_weights[:, 0] = code_weights[0]
    # (uni3detr_head.py:691, :696).
    cw_mean = float(np.mean(cfg.code_weights))
    cw0 = float(cfg.code_weights[0])
    loss_iou = jnp.sum(iou_term * pos) / num_pos \
        * cfg.loss_iou_weight * cw_mean
    loss_iou = loss_iou + jnp.sum((1.0 - iou_z) * pos) / num_pos * cw0

    iou_true = jax.lax.stop_gradient(
        iou3d_rotated_aligned(decoded, tgt, z_origin="bottom"))
    bce = jnp.maximum(iou_preds, 0) - iou_preds * iou_true + jnp.log1p(
        jnp.exp(-jnp.abs(iou_preds)))
    loss_iou_pred = jnp.sum(bce * pos) / num_pos * 1.2 * cw0

    out = {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
           "loss_iou": loss_iou, "loss_iou_pred": loss_iou_pred}
    if loss_consistency is not None:
        out["loss_consistency"] = loss_consistency
    return out


def uni3detr_loss(outs, gt_boxes, gt_labels, gt_mask, cfg: Uni3DETRConfig):
    """Total loss over all decoder layers.

    outs: head output dict (with optional 'all_uncertainty_preds' from the
    OV head); gt_boxes (B, Gt, 7|9) gravity-centered model boxes;
    gt_labels (B, Gt); gt_mask (B, Gt).
    Returns (total, dict of per-layer components 'd{i}.loss_*').
    """
    L = outs["all_cls_scores"].shape[0]
    unc = outs.get("all_uncertainty_preds")
    logs = {}
    total = 0.0
    for l in range(L):
        d = _layer_loss(outs["all_cls_scores"][l], outs["all_bbox_preds"][l],
                        outs["all_iou_preds"][l], gt_boxes, gt_labels,
                        gt_mask, cfg,
                        unc_preds=None if unc is None else unc[l])
        prefix = "" if l == L - 1 else f"d{l}."
        for k, v in d.items():
            logs[prefix + k] = v
            total = total + v
    return total, logs
