"""ObjectSample GT-database paste: lidar points, collision rejection,
and sample_2d image-crop pasting by depth order (VERDICT #6; reference
dbsampler.py:17-270 + transform_3d.py:692-774). Host-side numpy only."""
import os
import pickle

import numpy as np


def _write_db(root, n_feat=3):
    """Two 'car' objects with points + image crops."""
    os.makedirs(os.path.join(root, "gt_database"), exist_ok=True)
    from PIL import Image
    db = {"car": []}
    rng = np.random.RandomState(0)
    for j, (color, box) in enumerate([
            (255, np.array([2.0, 0, 0, 1.0, 1.0, 1.0, 0.0], np.float32)),
            (128, np.array([4.0, 0.5, 0, 0.8, 0.8, 0.8, 0.3],
                           np.float32))]):
        pts = rng.uniform(-0.4, 0.4, (50, n_feat)).astype(np.float32)
        rel = f"gt_database/0_car_{j}.bin"
        pts.tofile(os.path.join(root, rel))
        crop = np.full((8, 8, 3), color, np.uint8)
        crel = f"gt_database/0_car_{j}.png"
        Image.fromarray(crop).save(os.path.join(root, crel))
        db["car"].append({
            "name": "car", "path": rel, "box3d_lidar": box,
            "num_points_in_gt": 50, "difficulty": -1,
            "img_crop_path": crel})
    with open(os.path.join(root, "db.pkl"), "wb") as f:
        pickle.dump(db, f)


def _base_sample(with_img=False):
    rng = np.random.RandomState(1)
    pts = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
    sample = {
        "points": pts,
        "gt_boxes": np.array([[3.0, 3.0, -0.5, 1.0, 1.0, 1.0, 0.0]],
                             np.float32),
        "gt_labels": np.array([0], np.int32),
        "meta": {},
    }
    if with_img:
        sample["images"] = np.zeros((1, 64, 64, 3), np.float32)
        # pinhole at origin looking +x: u = 40*(-y)/x + 32, v = 40*(-z)/x + 32
        K = np.array([[40.0, 0, 32], [0, 40.0, 32], [0, 0, 1]], np.float32)
        T = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0],
                      [0, 0, 0, 1]], np.float32)
        P = np.eye(4, dtype=np.float32)
        P[:3] = K @ T[:3]
        sample["lidar2img"] = P[None]
    return sample


def _sampler(root, rng_seed=0, **kw):
    from uni3detr_tpu.data.pipeline import build_pipeline
    ctx = dict(class_names=["car"], data_root=root, pc_range=(),
               box_type="LiDAR")
    pipe = build_pipeline(
        [dict(type="UnifiedObjectSample", db_info_path="db.pkl",
              sample_groups={"car": 3}, **kw)], ctx)
    return lambda s: pipe(s, np.random.default_rng(rng_seed))


def test_lidar_paste_and_collision(tmp_path):
    from uni3detr_tpu.data import box_np_ops
    root = str(tmp_path)
    _write_db(root)
    s = _sampler(root)(_base_sample())
    assert len(s["gt_boxes"]) == 3  # 1 raw + 2 sampled (quota 3)
    # no BEV collisions among final boxes
    col = box_np_ops.box_collision_test(s["gt_boxes"][:, :7],
                                        s["gt_boxes"][:, :7])
    np.fill_diagonal(col, False)
    assert not col.any()
    # pasted points present inside each sampled box
    inside = box_np_ops.points_in_rbbox(s["points"][:, :3],
                                        s["gt_boxes"][1:, :7])
    assert (inside.sum(0) > 0).all()


def test_image_crop_paste_depth_order(tmp_path):
    root = str(tmp_path)
    _write_db(root)
    base = _base_sample(with_img=True)
    # raw box far behind the camera's view of sampled boxes: put it off
    # to the side so sampled crops dominate the center
    s = _sampler(root, rng_seed=0, sample_2d=True)(base)
    assert len(s["gt_boxes"]) == 3
    img = s["images"][0]
    # at least one sampled crop visible: pixels of value 255 or 128
    vals = set(np.unique(img).tolist())
    assert (255.0 in vals) or (128.0 in vals), sorted(vals)[-5:]
    # nearer sampled box must overwrite farther where they overlap:
    # project both sampled centers; the one with smaller depth wins at
    # its center pixel
    l2i = np.asarray(s["lidar2img"][0])
    sb = s["gt_boxes"][1:, :7]
    ctr = np.concatenate([sb[:, :3] + np.array([0, 0, 0.5]) * sb[:, 5:6],
                          np.ones((len(sb), 1))], 1)
    cp = ctr @ l2i.T
    depth = cp[:, 2]
    near = int(np.argmin(depth))
    uv = (cp[near, :2] / depth[near]).astype(int)
    if (0 <= uv[0] < 64) and (0 <= uv[1] < 64):
        expect = 255.0 if near == 0 else 128.0
        assert img[uv[1], uv[0], 0] == expect


def test_gt_database_with_crops_roundtrip(tmp_path):
    """create_gt_database(with_image_crops) -> db pkl with crop paths ->
    ObjectSample(sample_2d) consumes them."""
    import sys
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "points"), exist_ok=True)
    os.makedirs(os.path.join(root, "image"), exist_ok=True)
    from PIL import Image
    rng = np.random.RandomState(0)
    infos = []
    for i in range(2):
        pts = np.concatenate([
            rng.uniform(-0.3, 0.3, (100, 3)) + [0.0, 1.0, 0.0],
            rng.uniform(-1.5, 1.5, (200, 3))]).astype(np.float32)
        pts6 = np.concatenate(
            [pts, np.zeros((len(pts), 3), np.float32)], 1)
        pts6.tofile(os.path.join(root, f"points/{i:06d}.bin"))
        img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, f"image/{i:06d}.jpg"))
        infos.append({
            "pts_path": f"points/{i:06d}.bin",
            "image": {"image_path": f"image/{i:06d}.jpg",
                      "image_shape": (32, 32)},
            "calib": {"K": np.array([[20, 0, 16], [0, 20, 16], [0, 0, 1]],
                                    np.float32),
                      "Rt": np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]],
                                     np.float32)},
            "annos": {
                "gt_boxes_upright_depth": np.array(
                    [[0.0, 1.0, -0.3, 0.6, 0.6, 0.6, 0.0]], np.float32),
                "name": ["a"],
            },
        })
    with open(os.path.join(root, "sunrgbd_infos_train.pkl"), "wb") as f:
        pickle.dump(infos, f)

    cfg_py = os.path.join(root, "cfg.py")
    with open(cfg_py, "w") as f:
        f.write(
            "preset = 'uni3detr_tiny_synthetic'\n"
            "model = dict(num_classes=1)\n"
            "class_names = ['a']\n"
            f"data = dict(dataset_type='sunrgbd', data_root={root!r},\n"
            "  ann_train='sunrgbd_infos_train.pkl',\n"
            "  ann_val='sunrgbd_infos_train.pkl', use_camera=True,\n"
            "  load_dim=6, use_dim=(0, 1, 2), train_pipeline=[],\n"
            "  test_pipeline=[])\n")
    from uni3detr_tpu.cli.create_data import create_gt_database
    create_gt_database(cfg_py, root, with_image_crops=True)
    with open(os.path.join(root, "dbinfos_train.pkl"), "rb") as f:
        db = pickle.load(f)
    assert len(db["a"]) == 2
    assert all("img_crop_path" in r for r in db["a"])
    crop_path = os.path.join(root, db["a"][0]["img_crop_path"])
    assert os.path.exists(crop_path)
