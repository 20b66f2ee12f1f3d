"""KITTI-style 3D AP evaluation (AP11 / AP40 by difficulty).

Capability parity with the KITTI eval the reference delegates to mmdet3d
(SURVEY.md §3.2): per class x difficulty x IoU-threshold 3D AP with the
official recall-point interpolation (11 points for AP11, 40 for AP_R40).

Difficulty follows the official GT criteria when the info fields are
available (bbox height / occlusion / truncation). Detections are filtered
by projected 2D-box height like the official eval when they carry a
'bbox' field — :func:`project_boxes_to_image` produces it from the info
calib (the test CLI wires this via
:func:`uni3detr_tpu.train.evaluator.evaluate`). One documented deviation:
a height-ignored detection is dropped from matching entirely, where the
official eval lets it consume an ignored GT first — this only shifts
scores when an undersized detection overlaps an undersized GT.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def project_boxes_to_image(boxes_lidar, calib, image_shape=None):
    """(N, >=7) lidar storage boxes -> (N, 4) xyxy image boxes.

    Projects the 8 box corners through P2 @ R0_rect @ Tr_velo_to_cam
    (the official kitti.py camera chain). Boxes whose center lands behind
    the image plane get a degenerate (0-height) bbox so every difficulty
    level ignores them — the official eval only scores the camera frustum.
    """
    from ..box_np_ops import corners_3d
    if len(boxes_lidar) == 0:
        return np.zeros((0, 4), np.float32)
    P2 = np.asarray(calib["P2"], np.float64)       # (3, 4)
    R0 = np.asarray(calib["R0_rect"], np.float64)  # (4, 4)
    Tr = np.asarray(calib["Tr_velo_to_cam"], np.float64)
    corners = corners_3d(np.asarray(boxes_lidar, np.float64))  # (N, 8, 3)
    N = len(corners)
    hom = np.concatenate([corners.reshape(-1, 3),
                          np.ones((N * 8, 1))], 1)
    img = hom @ (P2 @ R0 @ Tr).T                   # (N*8, 3)
    z = img[:, 2].reshape(N, 8)
    px = (img[:, 0] / np.maximum(img[:, 2], 1e-6)).reshape(N, 8)
    py = (img[:, 1] / np.maximum(img[:, 2], 1e-6)).reshape(N, 8)
    bbox = np.stack([px.min(1), py.min(1), px.max(1), py.max(1)], 1)
    if image_shape is not None:
        h, w = image_shape[:2]
        bbox[:, [0, 2]] = np.clip(bbox[:, [0, 2]], 0, w - 1)
        bbox[:, [1, 3]] = np.clip(bbox[:, [1, 3]], 0, h - 1)
    behind = (z <= 0).any(1)
    bbox[behind] = 0.0
    return bbox.astype(np.float32)


def kitti_gt_from_info(info, classes):
    """Rebuild a full-annotation GT dict from an info record (the official
    eval scores against raw annotations, not the range-filtered training
    view): boxes_lidar + labels + the difficulty fields."""
    annos = info.get("annos", {})
    names = list(annos.get("name", []))
    keep = [i for i, n in enumerate(names) if n in classes]
    boxes = np.asarray(annos.get("gt_boxes_lidar", np.zeros((0, 7))),
                       np.float32).reshape(-1, 7)
    gt = {"boxes": boxes[keep] if len(boxes) else boxes,
          "labels": np.asarray([classes.index(names[i]) for i in keep],
                               np.int32)}
    for k in ("bbox", "occluded", "truncated"):
        if k in annos:
            gt[k] = np.asarray(annos[k])[keep]
    return gt

# official thresholds: (min 2D height px, max occlusion, max truncation)
DIFFICULTY = {
    0: (40, 0, 0.15),   # easy
    1: (25, 1, 0.30),   # moderate
    2: (25, 2, 0.50),   # hard
}
DEFAULT_IOU_THR = {"Car": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5}


def _gt_difficulty_mask(gt: dict, level: int):
    n = len(gt["boxes"])
    if "bbox" not in gt or "occluded" not in gt:
        return np.ones(n, bool), np.zeros(n, bool)
    hmin, occ_max, trunc_max = DIFFICULTY[level]
    h = gt["bbox"][:, 3] - gt["bbox"][:, 1]
    valid = ((h >= hmin) & (gt["occluded"] <= occ_max)
             & (gt["truncated"] <= trunc_max))
    # GTs failing this level but valid at a harder one are "ignored"
    ignored = ~valid
    return valid, ignored


def _ap_from_pr(recalls, precisions, n_points):
    if n_points == 11:
        thresholds = np.linspace(0.0, 1.0, 11)
    else:
        thresholds = np.linspace(1.0 / n_points, 1.0, n_points)
    ap = 0.0
    for t in thresholds:
        p = precisions[recalls >= t]
        ap += (p.max() if len(p) else 0.0) / len(thresholds)
    return ap


def kitti_eval(gt_list: List[dict], det_list: List[dict],
               classes: Sequence[str], iou_thr: Dict[str, float] = None,
               n_points: int = 40) -> Dict:
    """gt_list[i]: {'boxes' (G,7) lidar storage layout, 'labels',
    optional 'bbox'/'occluded'/'truncated'}; det_list[i]: {'boxes',
    'labels', 'scores'}. Returns {'{cls}_3d_{easy|moderate|hard}': AP}.
    """
    import jax.numpy as jnp
    from ...geom.iou import iou3d_rotated

    iou_thr = iou_thr or DEFAULT_IOU_THR
    results = {}
    for ci, cls in enumerate(classes):
        thr = iou_thr.get(cls, 0.5)
        # precompute per-scene class-filtered overlaps
        entries = []
        for gt, det in zip(gt_list, det_list):
            gm = gt["labels"] == ci
            dm = det["labels"] == ci
            gb, db = gt["boxes"][gm], det["boxes"][dm]
            ov = (np.asarray(iou3d_rotated(
                jnp.asarray(db[:, :7], jnp.float32),
                jnp.asarray(gb[:, :7], jnp.float32), z_origin="bottom"))
                if len(gb) and len(db)
                else np.zeros((len(db), len(gb)), np.float32))
            sub = {k: np.asarray(gt[k])[gm] for k in
                   ("bbox", "occluded", "truncated") if k in gt}
            sub["boxes"] = gb
            det_h = (det["bbox"][dm][:, 3] - det["bbox"][dm][:, 1]) \
                if "bbox" in det else None
            entries.append((sub, det["scores"][dm], ov, det_h))
        for level, lname in ((0, "easy"), (1, "moderate"), (2, "hard")):
            hmin = DIFFICULTY[level][0]
            tp, fp, scores, n_gt = [], [], [], 0
            for gt_sub, sc, ov, det_h in entries:
                valid, ignored = _gt_difficulty_mask(gt_sub, level)
                n_gt += int(valid.sum())
                order = np.argsort(-sc)
                matched = np.zeros(ov.shape[1], bool)
                for d in order:
                    if det_h is not None and det_h[d] < hmin:
                        continue  # det-height ignore (official eval.py
                        # clean_data: projected box below min height)
                    if ov.shape[1]:
                        j = int(np.argmax(ov[d] * ~matched))
                        if ov[d, j] >= thr and not matched[j]:
                            matched[j] = True
                            if ignored[j]:
                                continue  # neither TP nor FP
                            scores.append(sc[d]); tp.append(1.0)
                            fp.append(0.0)
                            continue
                    scores.append(sc[d]); tp.append(0.0); fp.append(1.0)
            key = f"{cls}_3d_{lname}"
            if n_gt == 0:
                results[key] = float("nan")
                continue
            if not scores:
                results[key] = 0.0
                continue
            order = np.argsort(-np.asarray(scores))
            ctp = np.cumsum(np.asarray(tp)[order])
            cfp = np.cumsum(np.asarray(fp)[order])
            rec = ctp / n_gt
            prec = ctp / np.maximum(ctp + cfp, 1e-9)
            results[key] = _ap_from_pr(rec, prec, n_points) * 100.0
    return results
