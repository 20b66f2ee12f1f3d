"""Real-data readiness rehearsal (VERDICT r3 item 9).

For each of the four Uni3DETR dataset families, generate a
reference-format on-disk fixture (raw KITTI layout / nuScenes JSON
tables / mmdet3d-style indoor info pkls), run the real data-prep path
(create_data converters + GT database), then drive the ACTUAL CLIs —
``uni3detr_tpu.cli.train`` for 10 steps and ``uni3detr_tpu.cli.test
--eval`` — against the shipped per-family configs at reduced model
budgets (--cfg-options). This rehearses exactly the workflow a user
with the real datasets follows (tools/real_data_checklist.md), so the
day real data lands only the budgets change.
"""
import os
import pickle
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# tiny model budgets shared by every family (mirrors TINY_SYNTHETIC,
# known-good shapes); per-family geometry is appended below
_TINY_MODEL = [
    "model.max_voxels=512", "model.max_voxels_test=512",
    "model.num_points=3000", "model.max_gt=8",
    "model.num_query=32", "model.num_decoder_layers=2",
    "model.embed_dim=32", "model.num_heads=4", "model.ffn_dim=64",
    "model.encoder_base_channels=8",
    "model.encoder_channels=((8,8,8),(8,8,16),(16,16,16),(16,16))",
    "model.encoder_downsample_paddings=((1,1,1),(1,1,1),(1,1,1))",
    "model.encoder_out_channels=32",
    "model.backbone_channels=(16,16,16)", "model.backbone_layers=(1,1,1)",
    "model.neck_channels=(32,32,32)",
    "model.max_num=32", "model.grid_size=(16,32,32)",
    "model.encoder_budget_caps=None",
    "data.samples_per_gpu=2",
]


def _run_cli(module, args, cfg_options=()):
    cmd = [sys.executable, "-m", module] + list(args)
    if cfg_options:
        cmd += ["--cfg-options"] + list(cfg_options)
    env = dict(os.environ, UNI3DETR_PLATFORM="cpu")
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=REPO, timeout=1500)
    assert r.returncode == 0, (
        f"{module} failed rc={r.returncode}\n--- stdout:\n"
        f"{r.stdout[-4000:]}\n--- stderr:\n{r.stderr[-4000:]}")
    return r


def _train_and_test(config, data_root, work_dir, extra_opts,
                    eval_flag="bbox", steps=10, samples=4):
    opts = _TINY_MODEL + [f"data.data_root={data_root}"] + list(extra_opts)
    _run_cli("uni3detr_tpu.cli.train",
             [config, "--work-dir", work_dir, "--max-steps", str(steps)],
             opts)
    assert os.path.isdir(os.path.join(work_dir, "latest"))
    r = _run_cli("uni3detr_tpu.cli.test",
                 [config, os.path.join(work_dir, "latest"),
                  "--eval", eval_flag, "--max-samples", str(samples),
                  "--out", os.path.join(work_dir, "dets.pkl")],
                 opts)
    with open(os.path.join(work_dir, "dets.pkl"), "rb") as f:
        dets = pickle.load(f)
    assert len(dets) == samples
    return r.stdout


def _make_indoor_infos(root, class_names, n_scenes=4, scannet=False,
                       pc_range=(-3.2, -0.2, -2.0, 3.2, 6.2, 0.56)):
    """mmdet3d-style indoor info pkls + point bins (the layout the
    standard sunrgbd/scannet preprocessing emits and DetDataset reads)."""
    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "points"), exist_ok=True)
    lo, hi = np.asarray(pc_range[:3]), np.asarray(pc_range[3:])
    infos = []
    for i in range(n_scenes):
        n_box = 3
        ctr = lo + (hi - lo) * (0.2 + 0.6 * rng.rand(n_box, 3))
        size = 0.4 + 0.8 * rng.rand(n_box, 3)
        yaw = (rng.rand(n_box, 1) - 0.5) * 2
        boxes = np.concatenate(
            [ctr[:, :2], (ctr[:, 2:] - size[:, 2:] / 2), size, yaw],
            1).astype(np.float32)  # bottom-z depth boxes
        # cluster points on the boxes + background
        pts = [ctr + (rng.rand(400, n_box, 3) - 0.5) * size]
        pts = pts[0].reshape(-1, 3)
        bg = lo + (hi - lo) * rng.rand(800, 3)
        xyz = np.concatenate([pts, bg]).astype(np.float32)
        pc = np.concatenate(
            [xyz, rng.rand(len(xyz), 3).astype(np.float32)], 1)
        rel = f"points/{i:06d}.bin"
        pc.tofile(os.path.join(root, rel))
        names = [class_names[j % len(class_names)] for j in range(n_box)]
        info = {"pts_path": rel,
                "annos": {"gt_boxes_upright_depth": boxes,
                          "name": np.asarray(names),
                          "gt_num": n_box}}
        if scannet:
            info["annos"]["axis_align_matrix"] = np.eye(4, dtype=np.float32)
        infos.append(info)
    prefix = "scannet" if scannet else "sunrgbd"
    for split in ("train", "val"):
        with open(os.path.join(root, f"{prefix}_infos_{split}.pkl"),
                  "wb") as f:
            pickle.dump(infos, f)


@pytest.mark.slow
def test_rehearse_sunrgbd(tmp_path):
    root = str(tmp_path / "sunrgbd")
    from uni3detr_tpu.config import load_config
    cfg = load_config(os.path.join(REPO,
                                   "configs/uni3detr/uni3detr_sunrgbd.py"))
    _make_indoor_infos(root, list(cfg["class_names"]))
    _train_and_test(
        "configs/uni3detr/uni3detr_sunrgbd.py", root,
        str(tmp_path / "wd"),
        ["model.voxel_size=(0.2,0.2,0.16)"])


@pytest.mark.slow
def test_rehearse_scannet(tmp_path):
    root = str(tmp_path / "scannet")
    from uni3detr_tpu.config import load_config
    cfg = load_config(os.path.join(REPO,
                                   "configs/uni3detr/uni3detr_scannet.py"))
    _make_indoor_infos(root, list(cfg["class_names"]), scannet=True,
                       pc_range=(-6.4, -6.4, -0.1, 6.4, 6.4, 2.46))
    _train_and_test(
        "configs/uni3detr/uni3detr_scannet.py", root,
        str(tmp_path / "wd"),
        ["model.voxel_size=(0.4,0.4,0.16)"])


@pytest.mark.slow
def test_rehearse_kitti(tmp_path):
    from uni3detr_tpu.cli.create_data import (create_kitti_infos,
                                              create_gt_database)
    root = str(tmp_path / "kitti")
    _write_kitti_raw(root)
    # data prep: raw layout -> info pkls (train + val)
    create_kitti_infos(root, os.path.join(root, "ImageSets/train.txt"),
                       os.path.join(root, "kitti_infos_train.pkl"))
    shutil.copy(os.path.join(root, "kitti_infos_train.pkl"),
                os.path.join(root, "kitti_infos_val.pkl"))
    # data prep: GT database for ObjectSample
    opts = _TINY_MODEL + [f"data.data_root={root}",
                          "model.voxel_size=(2.2,2.5,0.25)",
                          "model.gt_repeattimes=2"]
    create_gt_database(
        os.path.join(REPO, "configs/uni3detr/uni3detr_kitti_car.py"),
        root, cfg_options=opts)
    shutil.move(os.path.join(root, "dbinfos_train.pkl"),
                os.path.join(root, "kitti_dbinfos_train.pkl"))
    _train_and_test(
        "configs/uni3detr/uni3detr_kitti_car.py", root,
        str(tmp_path / "wd"),
        ["model.voxel_size=(2.2,2.5,0.25)", "model.gt_repeattimes=2",
         # box_merging needs enough overlap mass; keep plain nms for the
         # 10-step smoke
         "model.post_processing=nms", "model.score_thr=None"])


@pytest.mark.slow
def test_rehearse_nuscenes(tmp_path):
    from uni3detr_tpu.data.nuscenes_converter import create_nuscenes_infos
    from test_nuscenes_converter import _write_fixture
    root = str(tmp_path / "nuscenes")
    os.makedirs(root, exist_ok=True)
    version = _write_fixture(root)
    out = create_nuscenes_infos(root, version, max_sweeps=2)
    # all fixture scenes land in the train split; reuse them as val
    shutil.copy(out, out.replace("train", "val"))
    _train_and_test(
        "configs/uni3detr/uni3detr_nuscenes.py", root,
        str(tmp_path / "wd"),
        ["model.voxel_size=(3.375,3.375,0.5)", "data.cbgs=False",
         "model.num_thr=None"],
        eval_flag="bbox", samples=2)


def _write_kitti_raw(root, n_scenes=4):
    """Raw KITTI training layout (velodyne/label_2/calib + ImageSets)."""
    os.makedirs(os.path.join(root, "ImageSets"), exist_ok=True)
    for sub in ("velodyne", "label_2", "calib"):
        os.makedirs(os.path.join(root, "training", sub), exist_ok=True)
    rng = np.random.RandomState(1)
    ids = [f"{i:06d}" for i in range(n_scenes)]
    with open(os.path.join(root, "ImageSets/train.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    for idx in ids:
        # clustered cloud around two car boxes + ground
        cars = np.array([[15 + 10 * rng.rand(), -8 + 16 * rng.rand()]
                         for _ in range(2)])
        pts = []
        for cx, cy in cars:
            pts.append(np.concatenate([
                cx + (rng.rand(300, 1) - 0.5) * 4,
                cy + (rng.rand(300, 1) - 0.5) * 2,
                -1.5 + rng.rand(300, 1) * 1.5], 1))
        ground = np.concatenate([
            rng.rand(600, 1) * 60, (rng.rand(600, 1) - 0.5) * 70,
            -1.8 + rng.rand(600, 1) * 0.2], 1)
        xyz = np.concatenate(pts + [ground])
        pc = np.concatenate(
            [xyz, rng.rand(len(xyz), 1)], 1).astype(np.float32)
        pc.tofile(os.path.join(root, f"training/velodyne/{idx}.bin"))
        with open(os.path.join(root, f"training/calib/{idx}.txt"),
                  "w") as f:
            f.write("P2: 700 0 600 0 0 700 200 0 0 0 1 0\n")
            f.write("R0_rect: 1 0 0 0 1 0 0 0 1\n")
            f.write("Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0\n")
        with open(os.path.join(root, f"training/label_2/{idx}.txt"),
                  "w") as f:
            for cx, cy in cars:
                # cam loc: x=-y_l, y=-z_l(bottom->cam y uses -z), z=x_l
                f.write(f"Car 0.0 0 0.0 100 100 200 160 1.5 1.7 4.0 "
                        f"{-cy:.2f} 1.5 {cx:.2f} 0.2\n")
            f.write("DontCare -1 -1 -10 0 0 30 30 -1 -1 -1 "
                    "-1000 -1000 -1000 -10\n")
