"""Data preparation: ``python -m uni3detr_tpu.cli.create_data kitti --root
data/kitti`` etc.

Capability parity with the reference extra_tools/create_data.py +
data_converter/: info-pkl generation (KITTI from the raw layout; nuScenes
devkit-free via a direct walk of the raw JSON tables — see
data/nuscenes_converter.py) and GT-database creation for the ObjectSample
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
                # DontCare rows are KEPT (mmdet3d kitti_converter parity):
                # their raw placeholder values (loc -1000, dims -1, ry -10)
                # flow through the camera->lidar transform unchanged-by-name
                # and are consumed by eval's DontCare FP-absorption
                # (data/eval/kitti_eval.py) while the dataset's
                # class-name filter keeps them out of training GT.
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


def create_gt_database(config_path, out_dir, cfg_options=(),
                       with_image_crops=False):
    """Crop per-GT point sets from the train split and write
    <prefix>_dbinfos_train.pkl + per-object .bin files (reference
    create_unified_gt_database.py:70-180). With ``with_image_crops`` (and
    a camera-enabled dataset) also saves each object's projected 2D-bbox
    image patch (":106-180" multi-view crop path) for
    ObjectSample(sample_2d=True) pasting."""
    from ..config import load_config, merge_cfg_options, build_model_config
    from ..data.datasets import build_dataset
    from ..data import box_np_ops

    cfg = load_config(config_path)
    cfg = merge_cfg_options(cfg, list(cfg_options))
    mc = build_model_config(cfg)
    data_cfg = dict(cfg.data)
    # raw samples, no augmentation (images only if crops requested)
    data_cfg["train_pipeline"] = (
        [dict(type="LoadImageFromFile")] if with_image_crops else [])
    ds = build_dataset(data_cfg, cfg.class_names, mc.pc_range, "train")
    os.makedirs(os.path.join(out_dir, "gt_database"), exist_ok=True)
    db = {c: [] for c in cfg.class_names}
    for i in range(len(ds)):
        s = ds[i]
        pts, boxes, labels = s["points"], s["gt_boxes"], s["gt_labels"]
        if not len(boxes):
            continue
        inside = box_np_ops.points_in_rbbox(pts[:, :3], boxes[:, :7])
        crop_paths = [None] * len(boxes)
        if with_image_crops and s.get("images") is not None:
            crop_paths = _save_image_crops(
                s, boxes, labels, cfg.class_names, out_dir, i)
        for j in range(len(boxes)):
            obj = pts[inside[:, j]]
            if not len(obj):
                continue
            obj = obj.copy()
            obj[:, :3] -= boxes[j, :3]
            name = cfg.class_names[labels[j]]
            rel = f"gt_database/{i}_{name}_{j}.bin"
            obj.astype(np.float32).tofile(os.path.join(out_dir, rel))
            rec = {
                "name": name, "path": rel,
                "box3d_lidar": boxes[j, :7].astype(np.float32),
                "num_points_in_gt": int(len(obj)),
                "difficulty": -1,
            }
            if crop_paths[j]:
                rec["img_crop_path"] = crop_paths[j]
            db[name].append(rec)
        if (i + 1) % 100 == 0:
            print(f"[{i+1}/{len(ds)}]")
    out = os.path.join(out_dir, "dbinfos_train.pkl")
    with open(out, "wb") as f:
        pickle.dump(db, f)
    print(f"wrote {sum(len(v) for v in db.values())} objects -> {out}")


def _save_image_crops(sample, boxes, labels, class_names, out_dir, idx):
    """Project each GT box into the first view it is visible in and save
    the 2D-bbox patch as a png; returns per-box relative paths."""
    from PIL import Image
    from ..data import box_np_ops
    imgs = sample["images"]
    l2is = np.asarray(sample["lidar2img"], np.float32)
    corners = box_np_ops.corners_3d(boxes[:, :7])
    hom = np.concatenate([corners, np.ones_like(corners[..., :1])], -1)
    out = [None] * len(boxes)
    for v in range(len(imgs)):
        H, W = imgs[v].shape[:2]
        cp = hom @ l2is[v].T
        depth = cp[..., 2]
        vis = (depth > 0).all(-1)
        uv = cp[..., :2] / np.maximum(depth[..., None], 1e-5)
        bb = np.concatenate([uv.min(1), uv.max(1)], -1).astype(int)
        bb[:, 0::2] = np.clip(bb[:, 0::2], 0, W - 1)
        bb[:, 1::2] = np.clip(bb[:, 1::2], 0, H - 1)
        ok = vis & ((bb[:, 2:] - bb[:, :2]) > 1).all(-1)
        for j in np.nonzero(ok)[0]:
            if out[j] is not None:
                continue
            x0, y0, x1, y1 = bb[j]
            patch = np.clip(imgs[v][y0:y1, x0:x1], 0, 255)
            name = class_names[labels[j]]
            rel = f"gt_database/{idx}_{name}_{j}.png"
            Image.fromarray(patch.astype(np.uint8)).save(
                os.path.join(out_dir, rel))
            out[j] = rel
    return out


def create_nuscenes_infos(root, version, out_dir=None, max_sweeps=10,
                          train_scene_file=None, val_scene_file=None):
    """Devkit-free nuScenes converter: walks the raw JSON tables directly
    (reference nuscenes_converter.py:148-305 semantics; see
    uni3detr_tpu/data/nuscenes_converter.py). The official trainval split
    lists can be passed as plain text files of scene names."""
    from ..data.nuscenes_converter import create_nuscenes_infos as conv
    return conv(root, version, out_dir, max_sweeps,
                train_scene_file, val_scene_file)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    k = sub.add_parser("kitti")
    k.add_argument("--root", required=True)
    k.add_argument("--split", default="train")
    g = sub.add_parser("gt_database")
    g.add_argument("config")
    g.add_argument("--out-dir", required=True)
    g.add_argument("--with-image-crops", action="store_true")
    n = sub.add_parser("nuscenes")
    n.add_argument("--root", required=True)
    n.add_argument("--version", default="v1.0-trainval")
    n.add_argument("--out-dir", default=None)
    n.add_argument("--max-sweeps", type=int, default=10)
    n.add_argument("--train-scenes", default=None,
                   help="text file of scene names (one per line)")
    n.add_argument("--val-scenes", default=None)
    args = p.parse_args()
    if args.cmd == "kitti":
        split_file = os.path.join(args.root, "ImageSets",
                                  f"{args.split}.txt")
        create_kitti_infos(args.root, split_file,
                           os.path.join(args.root,
                                        f"kitti_infos_{args.split}.pkl"))
    elif args.cmd == "gt_database":
        create_gt_database(args.config, args.out_dir,
                           with_image_crops=args.with_image_crops)
    else:
        create_nuscenes_infos(args.root, args.version, args.out_dir,
                              args.max_sweeps, args.train_scenes,
                              args.val_scenes)


if __name__ == "__main__":
    main()
