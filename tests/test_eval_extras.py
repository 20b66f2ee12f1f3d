"""Tests for box merging, KITTI eval, TTA merge, VoVNet, profiling."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni3detr_tpu.data.eval.box_merging import merge_boxes_3d
from uni3detr_tpu.data.eval.kitti_eval import kitti_eval
from uni3detr_tpu.train.tta import (make_aug_grid, apply_aug_points,
                                    map_boxes_back, merge_aug_detections)


def test_box_merging_merges_cluster():
    boxes = np.array([
        [0.0, 0, 0, 2, 2, 2, 0.0],
        [0.1, 0, 0, 2, 2, 2, 0.0],
        [0.2, 0, 0, 2, 2, 2, 0.0],
        [10.0, 10, 0, 2, 2, 2, 0.0],
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    labels = np.zeros(4, np.int64)
    l, b, s, idx = merge_boxes_3d(labels, boxes, scores, overlap_thr=0.1)
    assert len(s) == 2
    # merged box = median of cluster {0, .1, .2} -> x = 0.1
    assert b[0, 0] == pytest.approx(0.1)
    assert s[0] == pytest.approx(0.9)
    # different class does not merge
    labels2 = np.array([0, 1, 0, 0])
    l2, b2, s2, _ = merge_boxes_3d(labels2, boxes, scores, overlap_thr=0.1)
    assert len(s2) == 3


def _rep41(gt, det, n=41):
    """Replicate a 1-scene fixture across n images with distinct scores so
    a perfect detector fills all 41 official recall sample points (the
    official AP40 of a sparse eval set is legitimately < 100: empty recall
    points contribute zero precision)."""
    gts, dets = [], []
    for i in range(n):
        g = {k: np.copy(v) for k, v in gt.items()}
        d = {k: np.copy(v) for k, v in det.items()}
        d["scores"] = d["scores"] - i * 0.001
        gts.append(g)
        dets.append(d)
    return gts, dets


def test_kitti_eval_perfect():
    gt1 = {"boxes": np.array([[5, 0, -1, 4, 2, 1.5, 0.3]], np.float32),
           "labels": np.array([0])}
    det1 = {"boxes": gt1["boxes"].copy(), "labels": np.array([0]),
            "scores": np.array([0.9], np.float32)}
    gts, dets = _rep41(gt1, det1)
    res = kitti_eval(gts, dets, ["Car"])
    assert res["Car_3d_moderate"] == pytest.approx(100.0)
    miss = {"boxes": np.array([[50, 0, -1, 4, 2, 1.5, 0.3]], np.float32),
            "labels": np.array([0]),
            "scores": np.array([0.9], np.float32)}
    gts, dets = _rep41(gt1, miss)
    res = kitti_eval(gts, dets, ["Car"])
    assert res["Car_3d_moderate"] == pytest.approx(0.0)


def test_kitti_ap11_vs_ap40_official_sampling():
    """Official recall-point discretization: ONE perfect detection of ONE
    GT fills exactly one of the 41 sample points, so AP11 = 100/11 and
    AP40 = 0 (index 0 is excluded from the R40 average) — matching
    mmdet3d's get_mAP11/get_mAP40 on the same input."""
    gt1 = {"boxes": np.array([[5, 0, -1, 4, 2, 1.5, 0.3]], np.float32),
           "labels": np.array([0])}
    det1 = {"boxes": gt1["boxes"].copy(), "labels": np.array([0]),
            "scores": np.array([0.9], np.float32)}
    res11 = kitti_eval([gt1], [det1], ["Car"], n_points=11)
    res40 = kitti_eval([gt1], [det1], ["Car"], n_points=40)
    assert res11["Car_3d_moderate"] == pytest.approx(100.0 / 11.0)
    assert res40["Car_3d_moderate"] == pytest.approx(0.0)


def test_kitti_gt_major_assignment():
    """Official gt-major matching (eval.cpp computeStatistics,
    compute_fp=true): each GT takes its max-OVERLAP valid detection in
    GT order. GT A must take det1 (IoU 1.0) even though det0 has the
    higher score; det0 then matches GT B. Score-major greedy (the
    pre-round-4 behavior) would give A to det0 and turn det1 into a FP
    with B unmatched."""
    from uni3detr_tpu.data.eval.kitti_eval import (_second_pass,
                                                   _first_pass)
    ov = np.array([[0.60, 0.538],   # det0 vs (A, B)
                   [1.00, 0.290]])  # det1 vs (A, B)
    scores = np.array([0.9, 0.8])
    zeros = np.zeros(2, np.int32)
    tp, fp, _ = _second_pass(ov, scores, zeros, zeros, 0.0, 0.5)
    assert (tp, fp) == (2, 0)
    # the FIRST pass (threshold collection) is score-major: A takes the
    # higher-score det0, B is left without a candidate -> one TP score
    assert _first_pass(ov, scores, zeros, zeros, 0.5) == [0.9]


def _dc_fixture(with_dc, stray_in_dc=True):
    """One Car GT + matching det, plus a stray det (optionally inside a
    DontCare region)."""
    car = np.array([5, 0, -1, 4, 2, 1.5, 0.0], np.float32)
    junk = np.array([-1000, -1000, -1000, 1, 1, 1, 0], np.float32)
    if with_dc:
        gt = {"boxes": np.stack([car, junk]),
              "names": np.array(["Car", "DontCare"], dtype=object),
              "labels": np.array([0, -1]),
              "bbox": np.array([[0, 0, 60, 60], [100, 100, 160, 160]],
                               np.float32),
              "occluded": np.array([0, 0]),
              "truncated": np.array([0.0, 0.0], np.float32)}
    else:
        gt = {"boxes": car[None],
              "names": np.array(["Car"], dtype=object),
              "labels": np.array([0]),
              "bbox": np.array([[0, 0, 60, 60]], np.float32),
              "occluded": np.array([0]),
              "truncated": np.array([0.0], np.float32)}
    stray_bbox = [105, 105, 155, 155] if stray_in_dc else [300, 300, 350, 350]
    det = {"boxes": np.stack([car,
                              np.array([50, 20, -1, 4, 2, 1.5, 0],
                                       np.float32)]),
           "labels": np.array([0, 0]),
           # stray score interleaves between consecutive matched scores so
           # it is active (an FP candidate) at most thresholds
           "scores": np.array([0.9, 0.8995], np.float32),
           "bbox": np.array([[0, 0, 60, 60], stray_bbox], np.float32)}
    return gt, det


def test_kitti_second_pass_vectorized_equivalence():
    """_second_pass_all (the 41-threshold vectorization) must replay the
    scalar greedy pass exactly, including det_ign consumption, DontCare
    absorption and AOS similarity accumulation, on random fixtures."""
    from uni3detr_tpu.data.eval.kitti_eval import (_second_pass,
                                                   _second_pass_all)
    rng = np.random.RandomState(7)
    for trial in range(20):
        D = rng.randint(0, 12)
        G = rng.randint(0, 9)
        ov = rng.rand(D, G).astype(np.float64)
        # duplicated overlaps to exercise argmax tie order
        if D > 2 and G > 1:
            ov[1] = ov[0]
        scores = rng.rand(D)
        det_ign = rng.randint(0, 2, D).astype(np.int32)
        ignored_gt = rng.randint(-1, 2, G).astype(np.int32)
        thresholds = np.sort(rng.rand(rng.randint(1, 8)))[::-1]
        dc_ov = rng.rand(D, rng.randint(0, 3))
        sim = rng.rand(D, G)
        tp_v, fp_v, s_v = _second_pass_all(
            ov, scores, det_ign, ignored_gt, thresholds, 0.5,
            dc_ov=dc_ov, sim=sim)
        for ti, t in enumerate(thresholds):
            tp, fp, s = _second_pass(ov, scores, det_ign, ignored_gt,
                                     t, 0.5, dc_ov=dc_ov, sim=sim)
            assert (tp_v[ti], fp_v[ti]) == (tp, fp), trial
            assert s_v[ti] == pytest.approx(s), trial


def test_kitti_gt_height_boundary_inclusive():
    """Official clean_data ignores a GT whose 2D height is exactly the
    difficulty minimum (h <= MIN_HEIGHT); it must not count as a valid
    GT (a miss of it would otherwise cost recall)."""
    from uni3detr_tpu.data.eval.kitti_eval import _gt_ignored
    gt = {"boxes": np.zeros((2, 7), np.float32),
          "names": np.array(["Car", "Car"], dtype=object),
          # heights exactly 25 px and 26 px at moderate (hmin=25)
          "bbox": np.array([[0, 0, 50, 25], [0, 0, 50, 26]], np.float32),
          "occluded": np.array([0, 0]),
          "truncated": np.array([0.0, 0.0], np.float32)}
    ign = _gt_ignored(gt, "Car", 1)
    assert list(ign) == [1, 0]


def test_kitti_dontcare_absorbs_fp():
    """Official DontCare handling (2D bbox metric): a detection whose
    intersection/det-area with a DontCare region exceeds the overlap
    threshold is removed from the FP count; the 3D metric does not apply
    DontCare regions (mmdet3d applies them only for metric 0)."""
    gt, det = _dc_fixture(with_dc=True)
    gts, dets = _rep41(gt, det)
    res = kitti_eval(gts, dets, ["Car"])
    assert res["Car_bbox_moderate"] == pytest.approx(100.0)
    assert res["Car_3d_moderate"] < 100.0  # stray det IS a 3D FP

    # control: without the DontCare region the stray det is a bbox FP
    gt2, det2 = _dc_fixture(with_dc=False)
    gts2, dets2 = _rep41(gt2, det2)
    res2 = kitti_eval(gts2, dets2, ["Car"])
    assert res2["Car_bbox_moderate"] < 100.0

    # a stray det OUTSIDE the DontCare region is still a FP
    gt3, det3 = _dc_fixture(with_dc=True, stray_in_dc=False)
    gts3, dets3 = _rep41(gt3, det3)
    res3 = kitti_eval(gts3, dets3, ["Car"])
    assert res3["Car_bbox_moderate"] < 100.0


def test_kitti_ignored_gt_dontcare_interplay():
    """Undersized det consumes an ignored GT (neither TP nor FP), stray
    det inside DontCare is absorbed — the clean detection still scores a
    perfect bbox AP."""
    car = np.array([5, 0, -1, 4, 2, 1.5, 0.0], np.float32)
    far = np.array([20, 10, -1, 4, 2, 1.5, 0.0], np.float32)
    junk = np.array([-1000, -1000, -1000, 1, 1, 1, 0], np.float32)
    gt = {"boxes": np.stack([car, far, junk]),
          "names": np.array(["Car", "Car", "DontCare"], dtype=object),
          "labels": np.array([0, 0, -1]),
          # second Car GT is 10 px tall -> ignored at every difficulty
          "bbox": np.array([[0, 0, 60, 60], [200, 200, 260, 210],
                            [100, 100, 160, 160]], np.float32),
          "occluded": np.array([0, 0, 0]),
          "truncated": np.array([0.0, 0.0, 0.0], np.float32)}
    det = {"boxes": np.stack([car, far,
                              np.array([50, 20, -1, 4, 2, 1.5, 0],
                                       np.float32)]),
           "labels": np.array([0, 0, 0]),
           "scores": np.array([0.9, 0.8997, 0.8994], np.float32),
           # det1 is undersized (10 px) and sits on the ignored GT;
           # det2 sits inside the DontCare region
           "bbox": np.array([[0, 0, 60, 60], [200, 200, 260, 210],
                             [105, 105, 155, 155]], np.float32)}
    gts, dets = _rep41(gt, det)
    res = kitti_eval(gts, dets, ["Car"])
    assert res["Car_bbox_moderate"] == pytest.approx(100.0)


def test_kitti_neighbor_class_ignored():
    """A detection matching a Van GT is neither TP nor FP when
    evaluating Car (official neighboring-class ignore)."""
    car = np.array([5, 0, -1, 4, 2, 1.5, 0.0], np.float32)
    van = np.array([20, 10, -1, 5, 2.2, 2.0, 0.0], np.float32)
    gt = {"boxes": np.stack([car, van]),
          "names": np.array(["Car", "Van"], dtype=object),
          "labels": np.array([0, -1])}
    det = {"boxes": np.stack([car, van]), "labels": np.array([0, 0]),
           "scores": np.array([0.9, 0.8995], np.float32)}
    gts, dets = _rep41(gt, det)
    res = kitti_eval(gts, dets, ["Car"])
    assert res["Car_3d_moderate"] == pytest.approx(100.0)

    # control: with the Van row absent the det-on-Van becomes a FP
    gt2 = {"boxes": car[None],
           "names": np.array(["Car"], dtype=object),
           "labels": np.array([0])}
    gts2, dets2 = _rep41(gt2, det)
    res2 = kitti_eval(gts2, dets2, ["Car"])
    assert res2["Car_3d_moderate"] < 100.0


def test_tta_roundtrip():
    rng = np.random.RandomState(0)
    boxes = np.concatenate([
        rng.uniform(-2, 2, (5, 3)), rng.uniform(0.5, 1.5, (5, 3)),
        rng.uniform(-np.pi, np.pi, (5, 1))], 1).astype(np.float32)
    for aug in make_aug_grid((0.0, 0.4), (1.0, 1.1), (False, True)):
        pts = apply_aug_points(boxes[:, :3].copy(), aug)
        # treat centers as points: map back must recover originals
        back = map_boxes_back(
            np.concatenate([pts, boxes[:, 3:6] * aug["scale"],
                            boxes[:, 6:7]], 1), aug)
        np.testing.assert_allclose(back[:, :3], boxes[:, :3], atol=1e-5)
        np.testing.assert_allclose(back[:, 3:6], boxes[:, 3:6], atol=1e-5)


def test_tta_merge():
    d1 = {"boxes": np.array([[0, 0, 0, 2, 2, 2, 0.0]], np.float32),
          "scores": np.array([0.9], np.float32),
          "labels": np.array([0])}
    d2 = {"boxes": np.array([[0.05, 0, 0, 2, 2, 2, 0.0],
                             [8, 8, 0, 1, 1, 1, 0.0]], np.float32),
          "scores": np.array([0.8, 0.7], np.float32),
          "labels": np.array([0, 0])}
    out = merge_aug_detections([d1, d2], num_classes=1)
    assert len(out["scores"]) == 2  # overlapping pair suppressed to one
    assert out["scores"][0] == pytest.approx(0.9)


def test_vovnet_shapes():
    from uni3detr_tpu.models.vovnet import VoVNet
    m = VoVNet(stage_ch=(8, 8, 8, 8), concat_ch=(16, 16, 16, 16),
               blocks=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    outs = m.apply(vars_, x, train=False)
    assert len(outs) == 4
    assert outs[0].shape == (1, 16, 16, 16)
    assert outs[3].shape == (1, 2, 2, 16)


def test_flops_tool():
    from uni3detr_tpu.utils.profiling import flops_of
    cost = flops_of(lambda x: x @ x, jnp.zeros((64, 64)))
    assert cost["flops"] >= 2 * 64 * 64 * 64 * 0.9


def test_bev_visualization_writer(tmp_path):
    """--show-dir path: corner math + PNG writer (reference test.py
    --show-dir role, headless)."""
    from uni3detr_tpu.utils.visualize import bev_corners, save_results_bev
    # axis-aligned unit box at origin -> corners at (+-.5, +-.5)
    c = bev_corners(np.array([[0, 0, 0, 1, 1, 1, 0.0]], np.float32))
    assert np.allclose(sorted(c[0, :, 0]), [-0.5, -0.5, 0.5, 0.5])
    # 90-degree yaw swaps dx/dy extents
    c2 = bev_corners(np.array([[0, 0, 0, 2, 1, 1, np.pi / 2]], np.float32))
    assert np.allclose(np.abs(c2[0]).max(0), [0.5, 1.0], atol=1e-5)

    ds = [{"points": np.random.RandomState(0).rand(100, 3).astype(np.float32),
           "gt_boxes": np.array([[0.5, 0.5, 0, 1, 1, 1, 0.3]], np.float32),
           "meta": {"sample_idx": "scene7"}}]
    dets = [{"boxes": np.array([[0.4, 0.5, 0, 1, 1, 1, 0.2]], np.float32),
             "scores": np.array([0.9], np.float32),
             "labels": np.array([0])}]
    save_results_bev(ds, dets, str(tmp_path), class_names=["Car"], log=None)
    out = tmp_path / "scene7_bev.png"
    assert out.exists() and out.stat().st_size > 1000
