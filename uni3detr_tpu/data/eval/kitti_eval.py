"""KITTI-style 3D AP evaluation (AP11 / AP40 by difficulty).

Capability parity with the KITTI eval the reference delegates to mmdet3d
(SURVEY.md §3.2): per class x difficulty x IoU-threshold 3D AP with the
official recall-point interpolation (11 points for AP11, 40 for AP_R40).

Difficulty follows the official GT criteria when the info fields are
available (bbox height / occlusion / truncation); with bare 3D boxes every
GT counts for all difficulties (documented deviation — our detections
carry no projected 2D boxes, so the det-height filter is skipped).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

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
            entries.append((sub, det["scores"][dm], ov))
        for level, lname in ((0, "easy"), (1, "moderate"), (2, "hard")):
            tp, fp, scores, n_gt = [], [], [], 0
            for gt_sub, sc, ov in entries:
                valid, ignored = _gt_difficulty_mask(gt_sub, level)
                n_gt += int(valid.sum())
                order = np.argsort(-sc)
                matched = np.zeros(ov.shape[1], bool)
                for d in order:
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
