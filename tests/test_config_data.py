"""Config system, data pipeline, eval, and CLI smoke tests."""
import os
import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]

from uni3detr_tpu.config import (load_config, merge_cfg_options,
                                 build_model_config)
from uni3detr_tpu.data.pipeline import build_pipeline
from uni3detr_tpu.data import box_np_ops
from uni3detr_tpu.data.datasets import (SyntheticDataset, collate_batch,
                                        build_dataset)
from uni3detr_tpu.data.eval.indoor_eval import indoor_eval


ALL_CONFIGS = [
    "uni3detr/uni3detr_sunrgbd", "uni3detr/uni3detr_scannet",
    "uni3detr/uni3detr_scannet_large", "uni3detr/uni3detr_kitti_car",
    "uni3detr/uni3detr_kitti_3classes", "uni3detr/uni3detr_nuscenes",
    "uni3detr/uni3detr_synthetic_tiny",
    "ov_uni3detr/ov_uni3detr_sunrgbd_pc",
    "ov_uni3detr/ov_uni3detr_sunrgbd_rgb",
    "ov_uni3detr/ov_uni3detr_sunrgbd_mm",
]


@pytest.mark.parametrize("name", ALL_CONFIGS)
def test_all_configs_load_and_build(name):
    cfg = load_config(str(REPO / "configs" / f"{name}.py"))
    mc = build_model_config(cfg)
    assert mc.num_classes == len(cfg.class_names)
    assert "train_pipeline" in cfg.data
    # base merged in
    assert cfg.checkpoint_config["interval"] == 1
    if name.startswith("ov_"):
        from uni3detr_tpu.models.config import OVUni3DETRConfig
        assert isinstance(mc, OVUni3DETRConfig)
        assert len(cfg.seen_classes) == 10


def test_ov_train_step_runs():
    """Full OV multimodal train step through the generic step factory."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from uni3detr_tpu.train.step import (create_train_state,
                                         make_train_step, make_optimizer)
    from test_ov import OV_TINY, _ov_batch
    batch, gt = _ov_batch()
    batch = {**batch, **gt}
    tx = make_optimizer(1e-3)
    state = create_train_state(OV_TINY, jax.random.PRNGKey(0), batch, tx)
    step = make_train_step(OV_TINY, donate=False)
    state, logs = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["total_loss"]))
    assert "loss_consistency" in logs


def test_base_inheritance_and_overrides():
    cfg = load_config(
        str(REPO / "configs/uni3detr/uni3detr_kitti_3classes.py"))
    assert cfg.preset == "uni3detr_kitti_3classes"
    # inherited from kitti_car base
    assert cfg.data["dataset_type"] == "kitti"
    cfg = merge_cfg_options(cfg, ["model.num_query=128",
                                  "optimizer.lr=0.5"])
    mc = build_model_config(cfg)
    assert mc.num_query == 128
    assert cfg.optimizer["lr"] == 0.5


def test_unknown_model_field_rejected():
    cfg = load_config(
        str(REPO / "configs/uni3detr/uni3detr_synthetic_tiny.py"))
    cfg = merge_cfg_options(cfg, ["model.nonexistent=1"])
    with pytest.raises(KeyError):
        build_model_config(cfg)


def _ctx():
    return dict(pc_range=(-2, -2, -1, 2, 2, 1), class_names=["a", "b"],
                data_root="", box_type="Depth")


def _sample(n=200, g=3, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    boxes = np.concatenate([
        rng.uniform(-1, 1, (g, 2)), rng.uniform(-0.9, -0.5, (g, 1)),
        rng.uniform(0.3, 0.8, (g, 3)), rng.uniform(-np.pi, np.pi, (g, 1)),
    ], 1).astype(np.float32)
    return {"points": pts, "gt_boxes": boxes,
            "gt_labels": rng.randint(0, 2, g).astype(np.int32),
            "uni_rot_aug": np.eye(3, dtype=np.float32), "meta": {}}


def test_flip_keeps_points_in_boxes():
    pipe = build_pipeline([dict(type="RandomFlip3D",
                                flip_ratio_bev_horizontal=1.0,
                                flip_ratio_bev_vertical=1.0)], _ctx())
    s = _sample()
    # put one point exactly at a box gravity center
    s["points"][0, :2] = s["gt_boxes"][0, :2]
    s["points"][0, 2] = s["gt_boxes"][0, 2] + s["gt_boxes"][0, 5] / 2
    out = pipe(dict(s), np.random.default_rng(0))
    inside = box_np_ops.points_in_rbbox(out["points"][:1, :3],
                                        out["gt_boxes"][:1, :7])
    assert inside[0, 0]
    # double flip = rotation by pi in uni_rot_aug determinant terms
    assert np.isclose(np.linalg.det(out["uni_rot_aug"]), 1.0)


def test_rot_scale_keeps_points_in_boxes():
    pipe = build_pipeline([dict(type="GlobalRotScaleTrans",
                                rot_range=(0.7, 0.7),
                                scale_ratio_range=(1.1, 1.1))], _ctx())
    s = _sample(seed=1)
    s["points"][0, :2] = s["gt_boxes"][0, :2]
    s["points"][0, 2] = s["gt_boxes"][0, 2] + s["gt_boxes"][0, 5] / 2
    out = pipe(dict(s), np.random.default_rng(0))
    inside = box_np_ops.points_in_rbbox(out["points"][:1, :3],
                                        out["gt_boxes"][:1, :7])
    assert inside[0, 0]
    assert np.allclose(out["gt_boxes"][:, 3:6],
                       _sample(seed=1)["gt_boxes"][:, 3:6] * 1.1, atol=1e-5)


def test_range_filter_and_sample():
    pipe = build_pipeline([
        dict(type="PointsRangeFilter"),
        dict(type="PointSample", num_points=50),
    ], _ctx())
    s = _sample(n=500)
    s["points"][0] = [99, 99, 99]
    out = pipe(s, np.random.default_rng(0))
    assert len(out["points"]) == 50
    assert np.all(np.abs(out["points"][:, :2]) <= 2)


def test_object_name_filter_non_prefix_subset():
    """ObjectNameFilter keeps classes by NAME membership — a kept subset
    that is not a prefix of class_names must keep exactly those labels
    (mmdet3d ObjectNameFilter semantics)."""
    ctx = dict(_ctx(), class_names=["Car", "Pedestrian", "Cyclist"])
    pipe = build_pipeline([dict(type="ObjectNameFilter",
                                classes=["Pedestrian"])], ctx)
    s = _sample(g=6)
    s["gt_labels"] = np.array([0, 1, 2, 1, 0, 2], np.int32)
    out = pipe(s, np.random.default_rng(0))
    assert np.all(out["gt_labels"] == 1)
    assert len(out["gt_boxes"]) == 2


def test_collision_test_oracle():
    a = np.array([[0, 0, 0, 2, 2, 1, 0.0]], np.float32)
    b = np.array([[0.5, 0.5, 0, 2, 2, 1, 0.7],
                  [5, 5, 0, 1, 1, 1, 0.0]], np.float32)
    col = box_np_ops.box_collision_test(a, b)
    assert col[0, 0] and not col[0, 1]


def test_synthetic_dataset_and_collate():
    ds = SyntheticDataset([dict(type="PointsRangeFilter"),
                           dict(type="PointSample", num_points=512)],
                          ["a", "b", "c"], (-2, -2, -1, 2, 2, 1), length=4,
                          n_points=1024)
    samples = [ds[i] for i in range(2)]
    batch, metas = collate_batch(samples, 512, 8, 3)
    assert batch["points"].shape == (2, 512, 3)
    assert batch["gt_mask"].any()


def test_indoor_eval_perfect_and_empty():
    gt = [{"boxes": np.array([[0, 0, 0, 1, 1, 1, 0.0]], np.float32),
           "labels": np.array([0])}]
    det_perfect = [{"boxes": gt[0]["boxes"], "labels": np.array([0]),
                    "scores": np.array([0.9], np.float32)}]
    res = indoor_eval(gt, det_perfect, ["a", "b"])
    assert res["mAP_0.25"] == pytest.approx(1.0)
    det_miss = [{"boxes": np.array([[5, 5, 5, 1, 1, 1, 0.0]], np.float32),
                 "labels": np.array([0]),
                 "scores": np.array([0.9], np.float32)}]
    res = indoor_eval(gt, det_miss, ["a", "b"])
    assert res["mAP_0.25"] == pytest.approx(0.0)


def test_indoor_eval_ov_split():
    gt = [{"boxes": np.array([[0, 0, 0, 1, 1, 1, 0.0],
                              [3, 3, 0, 1, 1, 1, 0.0]], np.float32),
           "labels": np.array([0, 1])}]
    det = [{"boxes": gt[0]["boxes"], "labels": np.array([0, 1]),
            "scores": np.array([0.9, 0.8], np.float32)}]
    res = indoor_eval(gt, det, ["a", "b"], seen_classes=["a"])
    assert res["mAP_seen_0.25"] == pytest.approx(1.0)
    assert res["mAP_unseen_0.25"] == pytest.approx(1.0)


@pytest.mark.slow
def test_cli_train_and_test_smoke(tmp_path, monkeypatch):
    from uni3detr_tpu.cli import train as train_cli
    from uni3detr_tpu.cli import test as test_cli
    cfgp = str(REPO / "configs/uni3detr/uni3detr_synthetic_tiny.py")
    wd = str(tmp_path / "wd")
    monkeypatch.setattr(sys, "argv", [
        "train", cfgp, "--work-dir", wd, "--cfg-options",
        "total_epochs=1", "evaluation.interval=1",
        "evaluation.max_samples=2", "data.length=4"])
    train_cli.main()  # runs the EvalHook after epoch 1
    assert os.path.exists(os.path.join(wd, "latest"))
    log = open(os.path.join(wd, "train.log")).read()
    assert "eval epoch 1" in log  # EvalHook fired and logged metrics
    import json
    meta = json.load(open(os.path.join(wd, "latest", "meta.json")))
    assert meta["classes"] == ["a", "b", "c"]  # embedded like the
    # reference's checkpoint meta (train.py:224-234)
    monkeypatch.setattr(sys, "argv", [
        "test", cfgp, os.path.join(wd, "latest"), "--eval", "bbox",
        "--max-samples", "2", "--batch-size", "2", "--tta"])
    test_cli.main()


@pytest.mark.slow
def test_cli_ov_train_and_test_smoke(tmp_path, monkeypatch):
    """The OV multimodal family end-to-end through the CLIs: synthetic
    lidar + procedural pinhole camera -> ResNet/FPN lift + fusion +
    CLIP head -> checkpoint -> eval (configs/ov_uni3detr/
    ov_uni3detr_synthetic_tiny.py)."""
    from uni3detr_tpu.cli import train as train_cli
    from uni3detr_tpu.cli import test as test_cli
    cfgp = str(REPO / "configs/ov_uni3detr/ov_uni3detr_synthetic_tiny.py")
    wd = str(tmp_path / "wd")
    monkeypatch.setattr(sys, "argv", [
        "train", cfgp, "--work-dir", wd, "--max-steps", "2",
        "--cfg-options", "data.length=4"])
    train_cli.main()
    assert os.path.exists(os.path.join(wd, "latest"))
    monkeypatch.setattr(sys, "argv", [
        "test", cfgp, os.path.join(wd, "latest"), "--eval", "bbox",
        "--max-samples", "2"])
    test_cli.main()
