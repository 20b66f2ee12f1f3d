"""Box-merging "NMS" post-processing (KITTI configs).

Capability parity with the reference bbox_merging
(core/bbox/bbox_merging.py:93-158, used at uni3detr_head.py:881-892 with
overlap threshold 0.1): detections are sorted by score; each survivor
absorbs all lower-scored same-class boxes overlapping above the threshold
and is replaced by the per-parameter MEDIAN of the cluster.

Deviation (deliberate): the reference computes overlaps with a
camera-coordinate corner convention (BEV over (x, z), dy as height —
bbox_merging.py:11-29) even though it is fed LiDAR-layout boxes; here the
overlap is the exact rotated 3D IoU in the boxes' own convention
(bottom-z), via the shared geom kernel. No shapely/cv2/numba needed.
"""
from __future__ import annotations

import numpy as np


def merge_boxes_3d(labels, boxes, scores, overlap_thr=0.1, top_k=-1):
    """labels (N,), boxes (N, 7+) storage layout, scores (N,).

    Returns (labels, boxes, scores, kept_indices).
    """
    import jax.numpy as jnp
    from ...geom.iou import iou3d_rotated

    order = np.argsort(-scores)
    if top_k > 0:
        order = order[:top_k]
    labels, boxes, scores = labels[order], boxes[order].copy(), scores[order]
    n = len(scores)
    if n == 0:
        return labels, boxes, scores, np.zeros(0, np.int64)
    iou = np.asarray(iou3d_rotated(jnp.asarray(boxes[:, :7]),
                                   jnp.asarray(boxes[:, :7]),
                                   z_origin="bottom"))
    keep = np.ones(n, bool)
    for i in range(n - 1):
        if not keep[i]:
            continue
        rest = np.arange(i + 1, n)
        rest = rest[keep[rest]]
        absorb = rest[(iou[i, rest] > overlap_thr)
                      & (labels[rest] == labels[i])]
        cluster = np.concatenate([boxes[absorb], boxes[[i]]], axis=0)
        boxes[i] = np.median(cluster, axis=0)
        keep[absorb] = False
    idx = np.where(keep)[0]
    return labels[idx], boxes[idx], scores[idx], order[idx]
