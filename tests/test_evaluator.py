"""Tests for the shared evaluator (batched inference, TTA fusion, EvalHook
metric dispatch), devkit-free nuScenes metrics, KITTI det-height filter,
and frozen_stages semantics."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni3detr_tpu.data.eval.nuscenes_metrics import \
    nuscenes_detection_metrics
from uni3detr_tpu.data.eval.kitti_eval import (kitti_eval,
                                               project_boxes_to_image)
from tiny import TINY, synth_scene


def _nusc_scene(rng, n=6):
    boxes = []
    for _ in range(n):
        boxes.append([rng.uniform(-30, 30), rng.uniform(-30, 30),
                      rng.uniform(-2, 0), rng.uniform(1, 4),
                      rng.uniform(1, 3), rng.uniform(1, 2),
                      rng.uniform(-np.pi, np.pi),
                      rng.uniform(-3, 3), rng.uniform(-3, 3)])
    return np.asarray(boxes, np.float32)


def test_nuscenes_metrics_perfect():
    rng = np.random.RandomState(0)
    classes = ["car", "pedestrian"]
    gts, dets = [], []
    for _ in range(3):
        b = _nusc_scene(rng)
        l = rng.randint(0, 2, len(b)).astype(np.int32)
        gts.append({"boxes": b, "labels": l})
        dets.append({"boxes": b.copy(), "labels": l.copy(),
                     "scores": rng.uniform(0.5, 1, len(b)).astype(
                         np.float32)})
    res = nuscenes_detection_metrics(dets, gts, classes)
    assert res["mAP"] == pytest.approx(1.0, abs=1e-6)
    assert res["mATE"] == pytest.approx(0.0, abs=1e-6)
    assert res["mASE"] == pytest.approx(0.0, abs=1e-6)
    assert res["mAOE"] == pytest.approx(0.0, abs=1e-6)
    assert res["mAVE"] == pytest.approx(0.0, abs=1e-6)
    assert res["NDS"] == pytest.approx(1.0, abs=1e-6)


def test_nuscenes_metrics_distance_thresholds():
    """A det 1.5 m off matches at thresholds 2 and 4 but not 0.5 and 1,
    so AP averages to ~0.5; misses hurt; far dets are FPs."""
    gt_b = np.array([[0, 0, 0, 4, 2, 1.5, 0.0, 0, 0]], np.float32)
    gts = [{"boxes": gt_b, "labels": np.array([0])}]
    det_b = gt_b.copy()
    det_b[0, 0] += 1.5
    dets = [{"boxes": det_b, "labels": np.array([0]),
             "scores": np.array([0.9], np.float32)}]
    res = nuscenes_detection_metrics(dets, gts, ["car"])
    # AP=1 at {2,4}, 0 at {0.5,1} (after the 0.1-clip AP of a perfect
    # single-det curve is 1.0)
    assert res["car_AP"] == pytest.approx(0.5, abs=0.02)
    assert res["mATE"] == pytest.approx(1.5, abs=1e-6)


def test_nuscenes_metrics_class_rules():
    """barrier: yaw period pi and no velocity term; traffic_cone: no
    orientation/velocity."""
    gt_b = np.array([[0, 0, 0, 1, 1, 1, 0.0, 5, 5]], np.float32)
    det_b = gt_b.copy()
    det_b[0, 6] = np.pi  # flipped yaw
    det_b[0, 7:9] = 0    # wrong velocity (should be ignored)
    gts = [{"boxes": gt_b, "labels": np.array([0])}]
    dets = [{"boxes": det_b, "labels": np.array([0]),
             "scores": np.array([0.9], np.float32)}]
    res_bar = nuscenes_detection_metrics(dets, gts, ["barrier"])
    assert res_bar["mAOE"] == pytest.approx(0.0, abs=1e-6)  # period pi
    assert "mAVE" not in res_bar
    res_cone = nuscenes_detection_metrics(dets, gts, ["traffic_cone"])
    assert "mAOE" not in res_cone  # cones excluded from AOE averaging
    res_car = nuscenes_detection_metrics(dets, gts, ["car"])
    assert res_car["mAOE"] == pytest.approx(np.pi, abs=1e-5)
    assert res_car["mAVE"] == pytest.approx(np.hypot(5, 5), abs=1e-4)


def _identity_calib():
    """Camera at origin looking +x (lidar) via Tr mapping lidar (x,y,z)
    -> cam (-y, -z, x); f=100, principal point (50, 50)."""
    Tr = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0],
                   [0, 0, 0, 1]], np.float64)
    P2 = np.array([[100, 0, 50, 0], [0, 100, 50, 0], [0, 0, 1, 0]],
                  np.float64)
    return {"P2": P2, "R0_rect": np.eye(4), "Tr_velo_to_cam": Tr}


def test_project_boxes_to_image_height():
    calib = _identity_calib()
    # axis-aligned 2m-tall box 10m ahead -> height ~ 100 * 2 / 10 = 20 px
    boxes = np.array([[10.0, 0, -1, 2, 2, 2, 0.0]], np.float32)
    bb = project_boxes_to_image(boxes, calib)
    h = bb[0, 3] - bb[0, 1]
    assert 18 < h < 25
    # behind the camera -> degenerate bbox
    behind = np.array([[-10.0, 0, -1, 2, 2, 2, 0.0]], np.float32)
    bb2 = project_boxes_to_image(behind, calib)
    assert (bb2 == 0).all()


def test_kitti_det_height_filter():
    gt_b = np.array([[10, 0, -1, 4, 2, 1.5, 0.0]], np.float32)
    gt = [{"boxes": gt_b, "labels": np.array([0])}]
    # det matches the GT but its projected box is 10 px tall -> ignored at
    # every difficulty (hmin >= 25), so recall stays 0 without FP penalty
    det = [{"boxes": gt_b.copy(), "labels": np.array([0]),
            "scores": np.array([0.9], np.float32),
            "bbox": np.array([[0, 0, 10, 10]], np.float32)}]
    res = kitti_eval(gt, det, ["Car"])
    assert res["Car_3d_moderate"] == pytest.approx(0.0)
    det[0]["bbox"] = np.array([[0, 0, 10, 50]], np.float32)  # 50 px tall
    res2 = kitti_eval(gt, det, ["Car"])
    assert res2["Car_3d_moderate"] == pytest.approx(100.0)


def test_run_inference_batched_and_tta():
    """Batched inference covers the dataset exactly once (tail padded),
    and the TTA path fuses aug views without crashing."""
    from uni3detr_tpu.train.step import (create_train_state, make_eval_step,
                                         make_optimizer)
    from uni3detr_tpu.train.evaluator import run_inference
    from uni3detr_tpu.train.tta import make_aug_grid
    from tiny import pad_batch

    class DS:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            pts, boxes, labels = synth_scene(rng)
            return {"points": pts, "gt_boxes": boxes, "gt_labels": labels}

    cfg = dataclasses.replace(TINY, num_points=512, max_gt=8)
    rng = np.random.RandomState(0)
    pts, pmask, boxes, labels, gmask = pad_batch([synth_scene(rng)])
    batch0 = {"points": jnp.asarray(pts), "pts_mask": jnp.asarray(pmask),
              "gt_boxes": jnp.asarray(boxes),
              "gt_labels": jnp.asarray(labels),
              "gt_mask": jnp.asarray(gmask)}
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch0,
                               make_optimizer(1e-3))
    eval_fn = make_eval_step(cfg)
    dets, gts = run_inference(DS(), state, eval_fn, cfg, batch_size=2)
    assert len(dets) == 5 and len(gts) == 5
    grid = make_aug_grid(flips=(False, True))
    dets_tta, _ = run_inference(DS(), state, eval_fn, cfg, batch_size=2,
                                max_samples=2, tta_grid=grid)
    assert len(dets_tta) == 2
    for d in dets_tta:
        assert np.isfinite(d["boxes"]).all()


def test_frozen_stages_zero_grads():
    """frozen_stages=k: stem + stages<=k get zero grads and frozen BN
    stats (reference ResNet._freeze_stages semantics)."""
    from uni3detr_tpu.models.resnet import ResNet

    model = ResNet(stage_blocks=(1, 1), stage_with_dcn=(False, False),
                   frozen_stages=1)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)

    def loss(params):
        outs, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return sum(jnp.sum(o ** 2) for o in outs)

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    froz = ResNet.frozen_param_prefixes(1, scope="")
    froz = tuple(p.lstrip("/") for p in froz)
    n_frozen = n_live = 0
    for path, g in flat:
        ps = "/".join(getattr(k, "key", str(k)) for k in path)
        if any(ps.startswith(p) for p in froz):
            assert float(jnp.abs(g).max()) == 0.0, ps
            n_frozen += 1
        elif "layer2" in ps:
            n_live += float(jnp.abs(g).max()) > 0
    assert n_frozen > 0 and n_live > 0
    # frozen-stage BN stats do not mutate
    _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["layer1_0"]["bn1"]["mean"]
    after = mut["batch_stats"]["layer1_0"]["bn1"]["mean"]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    live_b = variables["batch_stats"]["layer2_0"]["bn1"]["mean"]
    live_a = mut["batch_stats"]["layer2_0"]["bn1"]["mean"]
    assert np.abs(np.asarray(live_a) - np.asarray(live_b)).max() > 0
