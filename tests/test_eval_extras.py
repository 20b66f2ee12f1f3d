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


def test_kitti_eval_perfect():
    gt = [{"boxes": np.array([[5, 0, -1, 4, 2, 1.5, 0.3]], np.float32),
           "labels": np.array([0])}]
    det = [{"boxes": gt[0]["boxes"].copy(), "labels": np.array([0]),
            "scores": np.array([0.9], np.float32)}]
    res = kitti_eval(gt, det, ["Car"])
    assert res["Car_3d_moderate"] == pytest.approx(100.0)
    miss = [{"boxes": np.array([[50, 0, -1, 4, 2, 1.5, 0.3]], np.float32),
             "labels": np.array([0]),
             "scores": np.array([0.9], np.float32)}]
    res = kitti_eval(gt, miss, ["Car"])
    assert res["Car_3d_moderate"] == pytest.approx(0.0)


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
