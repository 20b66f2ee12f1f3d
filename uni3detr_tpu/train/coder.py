"""NMS-free decode + post-processing, on device with static shapes.

Capability parity with the reference NMSFreeCoder (nms_free_coder.py:9-136)
and Uni3DETRHead.get_bboxes (uni3detr_head.py:827-918):

- decode averages the decoder layers 1..L-1 (skipping layer 0), takes the
  flat class-score topk ``max_num``, denormalizes boxes, masks by
  post_center_range, and blends score = cls^alpha * iou_pred^(1-alpha);
- z is shifted from gravity center back to bottom center (":842");
- per-class rotated-3D-IoU NMS / gaussian soft-NMS, scalar-or-per-class
  score threshold, top ``num_thr`` cut (":847-915").

Everything returns fixed-size arrays + validity masks; host code slices
them afterwards.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..geom.boxes import decode_boxes, bottom_center_boxes
from ..geom.iou import iou3d_rotated
from ..models.config import Uni3DETRConfig
from ..ops.nms import _greedy_suppress, soft_nms3d


def decode_predictions(outs, cfg: Uni3DETRConfig):
    """Head outputs -> (boxes (B, K, 7|9) gravity z, scores, labels, valid).

    K = cfg.max_num.
    """
    cls = jnp.mean(outs["all_cls_scores"][1:], axis=0)   # (B, Q, ncls)
    box = jnp.mean(outs["all_bbox_preds"][1:], axis=0)
    iou = jnp.mean(outs["all_iou_preds"][1:], axis=0)

    def single(cls_s, box_s, iou_s):
        ncls = cls_s.shape[-1]
        scores = jax.nn.sigmoid(cls_s).reshape(-1)       # (Q * ncls,)
        k = min(cfg.max_num, scores.shape[0])
        top_scores, idx = jax.lax.top_k(scores, k)
        labels = (idx % ncls).astype(jnp.int32)
        bidx = idx // ncls
        boxes = decode_boxes(box_s[bidx])
        ious = jax.nn.sigmoid(iou_s)[bidx]
        pcr = jnp.asarray(cfg.post_center_range, jnp.float32)
        ok = jnp.all(boxes[:, :3] >= pcr[:3], axis=-1)
        ok &= jnp.all(boxes[:, :3] <= pcr[3:6], axis=-1)
        final = top_scores ** cfg.coder_alpha * ious ** (1 - cfg.coder_alpha)
        return boxes, final, labels, ok

    return jax.vmap(single)(cls, box, iou)


@functools.partial(jax.jit, static_argnames=("cfg",))
def post_process(boxes, scores, labels, valid, cfg: Uni3DETRConfig):
    """Per-class NMS / soft-NMS + thresholds. boxes gravity-centered.

    Returns (boxes_bottom (B, K, .), scores, labels, valid) — still fixed
    size; invalid rows masked out.
    """
    boxes = bottom_center_boxes(boxes)

    def single(b, s, lab, v):
        if cfg.post_processing == "nms":
            iou = iou3d_rotated(b[:, :7], b[:, :7], z_origin="bottom")
            def class_keep(j):
                return _greedy_suppress(iou, s, v & (lab == j), cfg.nms_thr)
            keeps = jax.vmap(class_keep)(jnp.arange(cfg.num_classes))
            v2 = jnp.any(keeps, axis=0)
            s2 = s
        elif cfg.post_processing == "soft_nms":
            def class_soft(j):
                idxs, outs, ok = soft_nms3d(
                    b[:, :7], s, v & (lab == j),
                    gaussian_sigma=cfg.soft_nms_sigma,
                    prune_threshold=cfg.soft_nms_prune,
                    max_out=min(cfg.max_num, b.shape[0]))
                news = jnp.zeros_like(s)
                news = news.at[jnp.where(ok, idxs, b.shape[0] - 1)].max(
                    jnp.where(ok, outs, 0.0))
                newv = jnp.zeros_like(v).at[
                    jnp.where(ok, idxs, 0)].set(ok, mode="drop")
                return news, newv
            news, newv = jax.vmap(class_soft)(jnp.arange(cfg.num_classes))
            s2 = jnp.sum(news, axis=0)
            v2 = jnp.any(newv, axis=0)
        else:  # none / box_merging (host-side)
            s2, v2 = s, v

        if cfg.score_thr is not None:
            if isinstance(cfg.score_thr, (tuple, list)):
                thr = jnp.asarray(cfg.score_thr, jnp.float32)[lab]
            else:
                thr = cfg.score_thr
            v2 = v2 & (s2 > thr)
        if cfg.num_thr is not None:
            order = jnp.argsort(-jnp.where(v2, s2, -jnp.inf))
            rank = jnp.zeros_like(order).at[order].set(
                jnp.arange(order.shape[0]))
            v2 = v2 & (rank < cfg.num_thr)
        return b, s2, lab, v2

    return jax.vmap(single)(boxes, scores, labels, valid)
