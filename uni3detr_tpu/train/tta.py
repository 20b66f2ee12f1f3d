"""Test-time augmentation: aug grid + merged-box fusion.

Capability parity with the reference MultiRotScaleFlipAug3D
(datasets/pipelines/test_time_aug.py:10-125: a rot_degree x scale x flip
grid over the test pipeline) and merge_all_aug_bboxes_3d
(core/merge_all_augs.py:9-98: map each augmentation's detections back
through the inverse transform, concatenate, per-class rotated-BEV NMS at
0.1, keep top 500). The reference marks its aug_test "not done"
(uni3detr.py:318); this version is functional.
"""
from __future__ import annotations

import itertools
from typing import Dict, List, Sequence

import numpy as np


def make_aug_grid(rot_degrees: Sequence[float] = (0.0,),
                  scales: Sequence[float] = (1.0,),
                  flips: Sequence[bool] = (False,)):
    """List of aug descriptors {rot, scale, flip_h}."""
    return [dict(rot=r, scale=s, flip_h=f)
            for r, s, f in itertools.product(rot_degrees, scales, flips)]


def apply_aug_points(points, aug, box_type="Depth"):
    """Rot-scale first, then flip — matching the mmdet3d TTA pipeline
    order that ``map_boxes_back``'s inverse (flip, unscale, unrotate)
    assumes."""
    pts = points.copy()
    c, s = np.cos(aug["rot"]), np.sin(aug["rot"])
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    pts[..., :3] = pts[..., :3] @ rot.T * aug["scale"]
    if aug["flip_h"]:
        axis = 0 if box_type == "Depth" else 1
        pts[..., axis] = -pts[..., axis]
    return pts


def map_boxes_back(boxes, aug, box_type="Depth"):
    """Inverse of apply_aug_points on detected boxes (storage layout);
    reference bbox3d_mapping_back (core/bbox/util.py:82-102): flip,
    un-scale, un-rotate."""
    b = boxes.copy()
    if aug["flip_h"]:
        axis = 0 if box_type == "Depth" else 1
        b[:, axis] = -b[:, axis]
        b[:, 6] = np.pi - b[:, 6] if axis == 0 else -b[:, 6]
    b[:, :6] = b[:, :6] / aug["scale"]
    a = -aug["rot"]
    c, s = np.cos(a), np.sin(a)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    b[:, :3] = b[:, :3] @ rot.T
    b[:, 6] += a
    if b.shape[1] > 7:
        b[:, 7:9] = b[:, 7:9] @ rot[:2, :2].T
    return b


def merge_aug_detections(aug_dets: List[Dict], num_classes: int,
                         nms_thr: float = 0.1, max_out: int = 500):
    """aug_dets: list of {'boxes','scores','labels'} already mapped back.
    Returns merged dict (reference merge_all_augs.py:52-96)."""
    import jax.numpy as jnp
    from ..ops.nms import nms_bev_rotated

    boxes = np.concatenate([d["boxes"] for d in aug_dets])
    scores = np.concatenate([d["scores"] for d in aug_dets])
    labels = np.concatenate([d["labels"] for d in aug_dets])
    if len(boxes) == 0:
        return {"boxes": boxes, "scores": scores, "labels": labels}
    keep = np.zeros(len(boxes), bool)
    for c in range(num_classes):
        m = labels == c
        if not m.any():
            continue
        k = np.asarray(nms_bev_rotated(
            jnp.asarray(boxes[:, :7], jnp.float32),
            jnp.asarray(np.where(m, scores, 0.0), jnp.float32),
            jnp.asarray(m), nms_thr))
        keep |= k & m
    idx = np.where(keep)[0]
    order = idx[np.argsort(-scores[idx])][:max_out]
    return {"boxes": boxes[order], "scores": scores[order],
            "labels": labels[order]}
