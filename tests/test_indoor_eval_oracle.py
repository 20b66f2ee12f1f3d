"""Whole-evaluator cross-check of indoor_eval against an independent
transcription of the reference algorithm (VERDICT r2 weak 7).

mmdet3d is not installable in this image, so the oracle below is a
direct dict-based transcription of the reference ``eval_det_cls`` +
``average_precision`` (core/indoor_eval.py:7-160): global confidence
sort, per-image per-threshold matched flags, argmax-overlap greedy with
STRICT iou_max > thresh, VOC area AP. Overlaps are shared (the same
rotated-3D IoU kernel) so the comparison isolates the
matching/accumulation logic.
"""
import numpy as np
import pytest

from uni3detr_tpu.data.eval.indoor_eval import indoor_eval, \
    _average_precision, _overlaps


def oracle_eval_det_cls(pred, gt, iou_thrs):
    """Transcribed reference eval_det_cls (indoor_eval.py:55-160).

    pred: {img_id: list of (box (7,), score)}; gt: {img_id: (G, 7)}."""
    class_recs = {}
    npos = 0
    for img_id, boxes in gt.items():
        class_recs[img_id] = {
            "bbox": np.asarray(boxes, np.float32).reshape(-1, 7),
            "det": [[False] * len(boxes) for _ in iou_thrs]}
        npos += len(boxes)
    image_ids, confidence, ious = [], [], []
    for img_id, dets in pred.items():
        if not dets:
            continue
        db = np.stack([b for b, _ in dets])
        gt_cur = class_recs[img_id]["bbox"]
        ov = _overlaps(db, gt_cur) if len(gt_cur) else \
            np.zeros((len(db), 1), np.float32)
        for i, (_, s) in enumerate(dets):
            image_ids.append(img_id)
            confidence.append(s)
            ious.append(ov[i])
    order = np.argsort(-np.asarray(confidence))
    image_ids = [image_ids[i] for i in order]
    ious = [ious[i] for i in order]
    nd = len(image_ids)
    tp_thr = [np.zeros(nd) for _ in iou_thrs]
    fp_thr = [np.zeros(nd) for _ in iou_thrs]
    for d in range(nd):
        R = class_recs[image_ids[d]]
        iou_max, jmax = -np.inf, -1
        for j in range(len(R["bbox"])):
            if ious[d][j] > iou_max:
                iou_max, jmax = ious[d][j], j
        for ti, thr in enumerate(iou_thrs):
            if iou_max > thr:
                if not R["det"][ti][jmax]:
                    tp_thr[ti][d] = 1.0
                    R["det"][ti][jmax] = True
                else:
                    fp_thr[ti][d] = 1.0
            else:
                fp_thr[ti][d] = 1.0
    out = []
    for ti in range(len(iou_thrs)):
        fp = np.cumsum(fp_thr[ti])
        tp = np.cumsum(tp_thr[ti])
        rec = tp / float(max(npos, 1))
        prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
        ap = _average_precision(rec, prec)
        out.append((rec[-1] if nd else 0.0, ap))
    return out, npos


def _random_fixture(rng, n_scenes=6, ncls=3):
    gts, dets = [], []
    for _ in range(n_scenes):
        G = rng.randint(1, 6)
        gb = np.concatenate([
            rng.uniform(-3, 3, (G, 2)), rng.uniform(-1, 0, (G, 1)),
            rng.uniform(0.5, 2.0, (G, 3)),
            rng.uniform(-np.pi, np.pi, (G, 1))], 1).astype(np.float32)
        gl = rng.randint(0, ncls, G).astype(np.int32)
        # dets: jittered copies (some matching, some near the threshold)
        # + pure noise, with cross-scene interleaved scores and exact
        # score ties to stress the ordering
        reps = rng.randint(1, 3)
        db = np.concatenate([gb + rng.randn(G, 7).astype(np.float32)
                             * rng.choice([0.01, 0.15, 0.6])
                             for _ in range(reps)]
                            + [np.concatenate([
                                rng.uniform(-3, 3, (3, 2)),
                                rng.uniform(-1, 0, (3, 1)),
                                rng.uniform(0.5, 2.0, (3, 3)),
                                rng.uniform(-np.pi, np.pi, (3, 1))],
                                1).astype(np.float32)])
        dl = np.concatenate([gl] * reps
                            + [rng.randint(0, ncls, 3)]).astype(np.int32)
        # unique scores: with exact ties the visit order is undefined in
        # BOTH implementations (np.argsort is not stable by default), so
        # tie behavior is out of the parity contract
        ds = (rng.uniform(0.1, 1.0, len(db))
              + np.arange(len(db)) * 1e-5).astype(np.float32)
        gts.append({"boxes": gb, "labels": gl})
        dets.append({"boxes": db, "labels": dl, "scores": ds})
    return gts, dets


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_indoor_eval_matches_reference_transcription(seed):
    rng = np.random.RandomState(seed)
    classes = ["chair", "table", "bed"]
    iou_thrs = (0.25, 0.5)
    gts, dets = _random_fixture(rng)
    res = indoor_eval(gts, dets, classes, iou_thrs=iou_thrs)
    for ci, cls in enumerate(classes):
        pred = {}
        gt = {}
        for si, (g, d) in enumerate(zip(gts, dets)):
            gm = g["labels"] == ci
            dm = d["labels"] == ci
            gt[si] = g["boxes"][gm][:, :7]
            pred[si] = [(b[:7], float(s)) for b, s in
                        zip(d["boxes"][dm], d["scores"][dm])]
        (r25, ap25), (r50, ap50) = oracle_eval_det_cls(
            pred, gt, iou_thrs)[0]
        npos = oracle_eval_det_cls(pred, gt, iou_thrs)[1]
        if npos == 0:
            continue
        assert res["AP_0.25"][cls] == pytest.approx(ap25, abs=1e-6), cls
        assert res["AP_0.50"][cls] == pytest.approx(ap50, abs=1e-6), cls
        assert res["AR_0.25"][cls] == pytest.approx(r25, abs=1e-6), cls
        assert res["AR_0.50"][cls] == pytest.approx(r50, abs=1e-6), cls
