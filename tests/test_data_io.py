"""Dataset loaders / converters on synthetic on-disk fixtures."""
import os
import pickle

import numpy as np
import pytest


def _write_kitti_fixture(root):
    os.makedirs(os.path.join(root, "ImageSets"), exist_ok=True)
    for sub in ("velodyne", "label_2", "calib"):
        os.makedirs(os.path.join(root, "training", sub), exist_ok=True)
    with open(os.path.join(root, "ImageSets/train.txt"), "w") as f:
        f.write("000000\n")
    pts = np.random.RandomState(0).uniform(
        0, 40, (500, 4)).astype(np.float32)
    pts.tofile(os.path.join(root, "training/velodyne/000000.bin"))
    with open(os.path.join(root, "training/calib/000000.txt"), "w") as f:
        P2 = "P2: " + " ".join(["700 0 600 0", "0 700 200 0",
                                "0 0 1 0"]).replace("  ", " ")
        f.write(P2 + "\n")
        f.write("R0_rect: 1 0 0 0 1 0 0 0 1\n")
        # velodyne->cam: x_cam = -y_l, y_cam = -z_l, z_cam = x_l
        f.write("Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0\n")
    with open(os.path.join(root, "training/label_2/000000.txt"), "w") as f:
        # type trunc occ alpha bbox4 h w l x y z ry
        f.write("Car 0.0 0 0.0 100 100 200 160 1.5 1.7 4.0 "
                "2.0 1.5 10.0 0.2\n")
        f.write("DontCare -1 -1 -10 0 0 0 0 -1 -1 -1 -1000 -1000 -1000 "
                "-10\n")


def test_kitti_converter_and_loader(tmp_path):
    from uni3detr_tpu.cli.create_data import create_kitti_infos
    root = str(tmp_path / "kitti")
    _write_kitti_fixture(root)
    out = os.path.join(root, "kitti_infos_train.pkl")
    create_kitti_infos(root, os.path.join(root, "ImageSets/train.txt"), out)
    with open(out, "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 1
    annos = infos[0]["annos"]
    # DontCare rows are kept (mmdet3d converter parity) so eval's
    # DontCare FP-absorption sees them; training filters them by name
    assert list(annos["name"]) == ["Car", "DontCare"]
    assert annos["gt_boxes_lidar"].shape[0] == 2
    box = annos["gt_boxes_lidar"][0]
    # cam loc (2.0, 1.5, 10.0) -> lidar (z_c, -x_c, -y_c) = (10, -2, -1.5)
    np.testing.assert_allclose(box[:3], [10.0, -2.0, -1.5], atol=1e-4)
    np.testing.assert_allclose(box[3:6], [4.0, 1.7, 1.5], atol=1e-5)

    # loader consumes the generated infos
    from uni3detr_tpu.data.datasets import DetDataset
    ds = DetDataset(root, "kitti_infos_train.pkl",
                    [dict(type="PointsRangeFilter")], ["Car"],
                    (0, -40, -3, 70.4, 40, 1), dataset_type="kitti",
                    box_type="LiDAR", load_dim=4, use_dim=(0, 1, 2, 3))
    s = ds[0]
    assert s["points"].shape[1] == 4
    assert len(s["gt_boxes"]) == 1


def test_gt_database_builder(tmp_path):
    import pathlib
    from uni3detr_tpu.cli.create_data import create_gt_database
    REPO = pathlib.Path(__file__).resolve().parents[1]
    cfgp = str(REPO / "configs/uni3detr/uni3detr_synthetic_tiny.py")
    out = str(tmp_path / "db")
    create_gt_database(cfgp, out)
    with open(os.path.join(out, "dbinfos_train.pkl"), "rb") as f:
        db = pickle.load(f)
    n = sum(len(v) for v in db.values())
    assert n > 0
    info = next(v[0] for v in db.values() if v)
    obj = np.fromfile(os.path.join(out, info["path"]),
                      np.float32).reshape(-1, 3)
    assert len(obj) == info["num_points_in_gt"]
    # object points are box-centered
    assert np.abs(obj[:, :2]).max() < 2.0


def test_nuscenes_submission_writer(tmp_path):
    from uni3detr_tpu.data.eval.nuscenes_eval import format_results
    det = [{"boxes": np.array([[1, 2, 0, 4, 2, 1.5, 0.3, 0.5, 0.1]],
                              np.float32),
            "labels": np.array([0]),
            "scores": np.array([0.9], np.float32)}]
    infos = [{"token": "tok0",
              "lidar2ego_rotation": [1, 0, 0, 0],
              "lidar2ego_translation": [0, 0, 1.8],
              "ego2global_rotation": [1, 0, 0, 0],
              "ego2global_translation": [100, 200, 0]}]
    out = format_results(det, infos, ["car"], str(tmp_path / "sub.json"))
    import json
    sub = json.load(open(out))
    ann = sub["results"]["tok0"][0]
    np.testing.assert_allclose(ann["translation"],
                               [101, 202, 2.55], atol=1e-5)
    assert ann["detection_name"] == "car"
