"""KITTI-style AP evaluation: 3D / BEV / 2D-bbox AP + AOS, AP11 / AP40.

Capability parity with the KITTI eval the reference delegates to mmdet3d
(SURVEY.md §3.2): per class x difficulty x IoU-threshold AP with the
official recall-point interpolation (11 points for AP11, 40 for AP_R40),
over three overlap modes —

- ``3d``: exact rotated 3D IoU;
- ``bev``: exact rotated bird's-eye IoU (official bev metric);
- ``bbox`` + ``aos``: 2D image-box IoU, plus Average Orientation
  Similarity ( (1+cos dalpha)/2 accumulated over TPs, official
  eval.cpp semantics ) — computed when detections carry projected
  2D boxes ('bbox', from :func:`project_boxes_to_image`) and
  observation angles ('alpha', from :func:`lidar_alpha`).

Difficulty follows the official GT criteria when the info fields are
available (bbox height / occlusion / truncation). Ignore handling
follows the official eval: a detection whose projected 2D height is
below the difficulty minimum is never a FP and may consume an ignored
GT (marking it matched) before other detections see it; a detection
matching an ignored GT counts neither TP nor FP. Remaining documented
deviation: matching is greedy in detection-score order (mmdet3d-style)
rather than the official gt-major assignment, and DontCare regions are
not modelled.
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


def lidar_alpha(boxes_lidar, calib):
    """Observation angle alpha of lidar boxes (official label field:
    alpha = rotation_y - atan2(x_cam, z_cam); rotation_y = -yaw - pi/2
    under the mmdet3d lidar->cam yaw convention)."""
    if len(boxes_lidar) == 0:
        return np.zeros((0,), np.float32)
    R0 = np.asarray(calib["R0_rect"], np.float64)
    Tr = np.asarray(calib["Tr_velo_to_cam"], np.float64)
    ctr = np.asarray(boxes_lidar, np.float64)[:, :3]
    hom = np.concatenate([ctr, np.ones((len(ctr), 1))], 1)
    cam = hom @ (R0 @ Tr).T                         # (N, 4)
    ry = -np.asarray(boxes_lidar)[:, 6] - np.pi / 2
    alpha = ry - np.arctan2(cam[:, 0], np.maximum(cam[:, 2], 1e-6))
    return alpha.astype(np.float32)


def kitti_gt_from_info(info, classes):
    """Rebuild a full-annotation GT dict from an info record (the official
    eval scores against raw annotations, not the range-filtered training
    view): boxes_lidar + labels + the difficulty/orientation fields."""
    annos = info.get("annos", {})
    names = list(annos.get("name", []))
    keep = [i for i, n in enumerate(names) if n in classes]
    boxes = np.asarray(annos.get("gt_boxes_lidar", np.zeros((0, 7))),
                       np.float32).reshape(-1, 7)
    gt = {"boxes": boxes[keep] if len(boxes) else boxes,
          "labels": np.asarray([classes.index(names[i]) for i in keep],
                               np.int32)}
    for k in ("bbox", "occluded", "truncated", "alpha"):
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
# official 2D-bbox thresholds match the 3D ones for the shipped classes
DEFAULT_IOU_THR_2D = {"Car": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5}


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


def _iou2d_matrix(db, gb):
    """(D, 4) x (G, 4) xyxy -> (D, G) IoU."""
    if len(db) == 0 or len(gb) == 0:
        return np.zeros((len(db), len(gb)), np.float32)
    x1 = np.maximum(db[:, None, 0], gb[None, :, 0])
    y1 = np.maximum(db[:, None, 1], gb[None, :, 1])
    x2 = np.minimum(db[:, None, 2], gb[None, :, 2])
    y2 = np.minimum(db[:, None, 3], gb[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    a1 = (db[:, 2] - db[:, 0]) * (db[:, 3] - db[:, 1])
    a2 = (gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1])
    return inter / np.maximum(a1[:, None] + a2[None, :] - inter, 1e-9)


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


def _accumulate_metric(entries, level, thr, ov_key, n_points,
                       with_aos=False):
    """One (class, difficulty, overlap-mode) PR accumulation.

    entries: per-scene dicts with 'gt', 'scores', 'det_h', overlap
    matrices under ov_key, and optionally 'sim' (D, G) orientation
    similarities. Returns (ap*100 or nan, aos*100 or None)."""
    hmin = DIFFICULTY[level][0]
    tp, fp, scores, sims, n_gt = [], [], [], [], 0
    for e in entries:
        ov = e[ov_key]
        valid, ignored = _gt_difficulty_mask(e["gt"], level)
        n_gt += int(valid.sum())
        sc = e["scores"]
        det_h = e["det_h"]
        order = np.argsort(-sc)
        matched = np.zeros(ov.shape[1], bool)
        for d in order:
            det_ign = det_h is not None and det_h[d] < hmin
            if det_ign:
                # official clean_data: undersized det is never a FP, but
                # consumes an IGNORED GT it overlaps (so the GT can't be
                # "free" for later detections)
                if ov.shape[1]:
                    cand = ov[d] * (ignored & ~matched)
                    j = int(np.argmax(cand))
                    if cand[j] >= thr:
                        matched[j] = True
                continue
            if ov.shape[1]:
                j = int(np.argmax(ov[d] * ~matched))
                if ov[d, j] >= thr and not matched[j]:
                    matched[j] = True
                    if ignored[j]:
                        continue  # neither TP nor FP
                    scores.append(sc[d])
                    tp.append(1.0)
                    fp.append(0.0)
                    sims.append(e["sim"][d, j] if with_aos else 0.0)
                    continue
            scores.append(sc[d])
            tp.append(0.0)
            fp.append(1.0)
            sims.append(0.0)
    if n_gt == 0:
        return float("nan"), (float("nan") if with_aos else None)
    if not scores:
        return 0.0, (0.0 if with_aos else None)
    order = np.argsort(-np.asarray(scores))
    ctp = np.cumsum(np.asarray(tp)[order])
    cfp = np.cumsum(np.asarray(fp)[order])
    rec = ctp / n_gt
    prec = ctp / np.maximum(ctp + cfp, 1e-9)
    ap = _ap_from_pr(rec, prec, n_points) * 100.0
    if not with_aos:
        return ap, None
    # AOS: precision-like curve with cumulated orientation similarity in
    # the numerator (official eval.cpp computeStatistics similarity)
    csim = np.cumsum(np.asarray(sims)[order])
    prec_aos = csim / np.maximum(ctp + cfp, 1e-9)
    aos = _ap_from_pr(rec, prec_aos, n_points) * 100.0
    return ap, aos


def kitti_eval(gt_list: List[dict], det_list: List[dict],
               classes: Sequence[str], iou_thr: Dict[str, float] = None,
               n_points: int = 40) -> Dict:
    """gt_list[i]: {'boxes' (G,7) lidar storage layout, 'labels',
    optional 'bbox'/'occluded'/'truncated'/'alpha'}; det_list[i]:
    {'boxes', 'labels', 'scores', optional 'bbox'/'alpha'}.

    Returns {'{cls}_{metric}_{easy|moderate|hard}': AP} for metrics 3d
    and bev always, plus bbox and aos when both sides carry 2D boxes
    (aos additionally needs 'alpha' on both sides).
    """
    import jax.numpy as jnp
    from ...geom.iou import iou3d_rotated, iou_bev_rotated

    iou_thr = iou_thr or DEFAULT_IOU_THR
    results = {}
    for ci, cls in enumerate(classes):
        thr = iou_thr.get(cls, 0.5)
        thr2d = DEFAULT_IOU_THR_2D.get(cls, 0.5)
        entries = []
        have_2d = True
        have_aos = True
        for gt, det in zip(gt_list, det_list):
            gm = gt["labels"] == ci
            dm = det["labels"] == ci
            gb, db = gt["boxes"][gm], det["boxes"][dm]
            if len(gb) and len(db):
                j1 = jnp.asarray(db[:, :7], jnp.float32)
                j2 = jnp.asarray(gb[:, :7], jnp.float32)
                ov3d = np.asarray(iou3d_rotated(j1, j2, z_origin="bottom"))
                ovbev = np.asarray(iou_bev_rotated(j1, j2))
            else:
                ov3d = np.zeros((len(db), len(gb)), np.float32)
                ovbev = ov3d
            e = {"gt": {k: np.asarray(gt[k])[gm] for k in
                        ("bbox", "occluded", "truncated", "alpha")
                        if k in gt},
                 "scores": det["scores"][dm],
                 "ov3d": ov3d, "ovbev": ovbev}
            e["gt"]["boxes"] = gb
            e["det_h"] = ((det["bbox"][dm][:, 3] - det["bbox"][dm][:, 1])
                          if "bbox" in det else None)
            if "bbox" in det and "bbox" in gt:
                e["ov2d"] = _iou2d_matrix(np.asarray(det["bbox"])[dm],
                                          np.asarray(gt["bbox"])[gm])
            else:
                have_2d = False
            if "alpha" in det and "alpha" in gt:
                da = np.asarray(det["alpha"])[dm]
                ga = np.asarray(gt["alpha"])[gm]
                e["sim"] = (1.0 + np.cos(da[:, None] - ga[None, :])) / 2.0
            else:
                have_aos = False
            entries.append(e)
        for level, lname in ((0, "easy"), (1, "moderate"), (2, "hard")):
            ap3d, _ = _accumulate_metric(entries, level, thr, "ov3d",
                                         n_points)
            apbev, _ = _accumulate_metric(entries, level, thr, "ovbev",
                                          n_points)
            results[f"{cls}_3d_{lname}"] = ap3d
            results[f"{cls}_bev_{lname}"] = apbev
            if have_2d:
                ap2d, aos = _accumulate_metric(
                    entries, level, thr2d, "ov2d", n_points,
                    with_aos=have_aos)
                results[f"{cls}_bbox_{lname}"] = ap2d
                if have_aos:
                    results[f"{cls}_aos_{lname}"] = aos
    return results
