"""Devkit-free nuScenes converter on a synthetic raw-table fixture:
JSON tables -> info pkl -> dataset -> multi-view multi-sweep pipeline ->
collate -> OV multimodal forward (VERDICT #5; reference
nuscenes_converter.py:148-305, loading_3d.py:110-190)."""
import json
import os
import pickle

import numpy as np
import pytest


def rotmat_to_quat(R):
    """3x3 -> (w, x, y, z)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return (0.25 * s, (R[2, 1] - R[1, 2]) / s,
                (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s)
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = [0.0] * 4
    q[0] = (R[k, j] - R[j, k]) / s
    q[i + 1] = 0.25 * s
    q[j + 1] = (R[j, i] + R[i, j]) / s
    q[k + 1] = (R[k, i] + R[i, k]) / s
    return tuple(q)


# CAM_FRONT-style optics: x_cam=-y_ego, y_cam=-z_ego, z_cam=+x_ego
CAM_R = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
K = np.array([[20.0, 0, 16], [0, 20.0, 16], [0, 0, 1]])


def _write_fixture(root):
    version = "v1.0-mini"
    tdir = os.path.join(root, version)
    os.makedirs(tdir, exist_ok=True)
    os.makedirs(os.path.join(root, "samples"), exist_ok=True)
    os.makedirs(os.path.join(root, "sweeps"), exist_ok=True)
    ident = (1.0, 0.0, 0.0, 0.0)
    cam_q = rotmat_to_quat(CAM_R)

    tables = {
        "log": [{"token": "log0", "logfile": "", "vehicle": "v",
                 "date_captured": "", "location": "x"}],
        "scene": [{"token": "sc0", "name": "scene-0001", "log_token":
                   "log0", "nbr_samples": 2, "first_sample_token": "s0",
                   "last_sample_token": "s1", "description": ""}],
        "sensor": [
            {"token": "se_l", "channel": "LIDAR_TOP", "modality": "lidar"},
            {"token": "se_cf", "channel": "CAM_FRONT",
             "modality": "camera"},
            {"token": "se_cb", "channel": "CAM_BACK",
             "modality": "camera"},
        ],
        "calibrated_sensor": [
            {"token": "cs_l", "sensor_token": "se_l",
             "translation": [0.0, 0.0, 1.8], "rotation": list(ident),
             "camera_intrinsic": []},
            {"token": "cs_cf", "sensor_token": "se_cf",
             "translation": [1.5, 0.0, 1.5], "rotation": list(cam_q),
             "camera_intrinsic": K.tolist()},
            {"token": "cs_cb", "sensor_token": "se_cb",
             "translation": [-1.5, 0.0, 1.5],
             "rotation": list(rotmat_to_quat(
                 CAM_R @ np.diag([-1.0, 1.0, -1.0]))),
             "camera_intrinsic": K.tolist()},
        ],
        "category": [{"token": "cat0", "name": "vehicle.car",
                      "description": ""}],
        "instance": [{"token": "in0", "category_token": "cat0",
                      "nbr_annotations": 2,
                      "first_annotation_token": "a0",
                      "last_annotation_token": "a1"}],
        "ego_pose": [],
        "sample": [],
        "sample_data": [],
        "sample_annotation": [],
    }

    rng = np.random.RandomState(0)
    # two keyframes 0.5 s apart, ego moves 1 m in x; one lidar sweep and
    # one cam sweep between them
    for i, (t_us, ego_x) in enumerate([(1_000_000, 0.0),
                                       (1_500_000, 1.0)]):
        tables["ego_pose"].append(
            {"token": f"ep{i}", "timestamp": t_us,
             "translation": [ego_x, 0.0, 0.0], "rotation": list(ident)})
        tables["sample"].append(
            {"token": f"s{i}", "timestamp": t_us, "scene_token": "sc0",
             "prev": "s0" if i else "", "next": "" if i else "s1",
             "anns": [f"a{i}"]})
        # lidar keyframe
        lp = f"samples/lidar_{i}.bin"
        rng.uniform(-40, 40, (256, 5)).astype(np.float32).tofile(
            os.path.join(root, lp))
        tables["sample_data"].append(
            {"token": f"sd_l{i}", "sample_token": f"s{i}",
             "calibrated_sensor_token": "cs_l",
             "ego_pose_token": f"ep{i}", "timestamp": t_us,
             "is_key_frame": True, "filename": lp, "fileformat": "bin",
             "prev": "sd_lsw0" if i else "", "next": ""})
        # cameras
        from PIL import Image
        for cam, cs in (("cf", "cs_cf"), ("cb", "cs_cb")):
            ip = f"samples/{cam}_{i}.jpg"
            Image.fromarray((rng.rand(32, 32, 3) * 255).astype(
                np.uint8)).save(os.path.join(root, ip))
            tables["sample_data"].append(
                {"token": f"sd_{cam}{i}", "sample_token": f"s{i}",
                 "calibrated_sensor_token": cs,
                 "ego_pose_token": f"ep{i}", "timestamp": t_us,
                 "is_key_frame": True, "filename": ip,
                 "fileformat": "jpg",
                 "prev": f"sd_{cam}sw0" if i else "", "next": ""})
        # annotation: a car 10 m ahead, drifting +2 m/s in x (global)
        tables["sample_annotation"].append(
            {"token": f"a{i}", "sample_token": f"s{i}",
             "instance_token": "in0",
             "translation": [10.0 + 1.0 * i, 0.0, 1.0],
             "size": [2.0, 4.0, 1.5],  # w, l, h
             "rotation": list(ident), "prev": "a0" if i else "",
             "next": "" if i else "a1", "num_lidar_pts": 5,
             "num_radar_pts": 1, "visibility_token": "",
             "attribute_tokens": []})

    # intermediate (non-keyframe) lidar + cam sweeps at t=1.25 s
    tables["ego_pose"].append(
        {"token": "ep_sw", "timestamp": 1_250_000,
         "translation": [0.5, 0.0, 0.0], "rotation": list(ident)})
    sp = "sweeps/lidar_sw.bin"
    rng.uniform(-40, 40, (256, 5)).astype(np.float32).tofile(
        os.path.join(root, sp))
    tables["sample_data"].append(
        {"token": "sd_lsw0", "sample_token": "s1",
         "calibrated_sensor_token": "cs_l", "ego_pose_token": "ep_sw",
         "timestamp": 1_250_000, "is_key_frame": False, "filename": sp,
         "fileformat": "bin", "prev": "sd_l0", "next": "sd_l1"})
    from PIL import Image
    for cam, cs in (("cf", "cs_cf"), ("cb", "cs_cb")):
        ip = f"sweeps/{cam}_sw.jpg"
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(
            np.uint8)).save(os.path.join(root, ip))
        tables["sample_data"].append(
            {"token": f"sd_{cam}sw0", "sample_token": "s1",
             "calibrated_sensor_token": cs, "ego_pose_token": "ep_sw",
             "timestamp": 1_250_000, "is_key_frame": False,
             "filename": ip, "fileformat": "jpg",
             "prev": f"sd_{cam}0", "next": f"sd_{cam}1"})

    for name, rows in tables.items():
        with open(os.path.join(tdir, f"{name}.json"), "w") as f:
            json.dump(rows, f)
    return version


def test_converter_schema_and_geometry(tmp_path):
    from uni3detr_tpu.data.nuscenes_converter import (
        NuScenesTables, create_nuscenes_infos, quat_to_rotmat)

    root = str(tmp_path)
    version = _write_fixture(root)
    val_file = os.path.join(root, "val.txt")
    with open(val_file, "w") as f:
        f.write("")  # all scenes -> train
    out = create_nuscenes_infos(root, version, max_sweeps=10)
    with open(out, "rb") as f:
        data = pickle.load(f)
    infos = data["infos"]
    assert len(infos) == 2
    i0, i1 = infos

    # lidar sweep chain: keyframe 1 walks prev through the non-key sweep
    # AND the earlier keyframe (reference walks the raw prev chain)
    assert len(i0["sweeps"]) == 0
    assert len(i1["sweeps"]) == 2
    sw = i1["sweeps"][0]
    # lidar->lidar between identical calibrations: rotation = I,
    # translation = ego motion expressed in the key frame (= -0.5 in x)
    np.testing.assert_allclose(sw["sensor2lidar_rotation"], np.eye(3),
                               atol=1e-9)
    np.testing.assert_allclose(sw["sensor2lidar_translation"],
                               [-0.5, 0, 0], atol=1e-9)
    np.testing.assert_allclose(i1["sweeps"][1]["sensor2lidar_translation"],
                               [-1.0, 0, 0], atol=1e-9)

    # camera record: sensor2lidar == cam->lidar within the same frame
    cf = i0["cams"]["CAM_FRONT"]
    np.testing.assert_allclose(cf["sensor2lidar_rotation"], CAM_R,
                               atol=1e-9)
    np.testing.assert_allclose(cf["sensor2lidar_translation"],
                               [1.5, 0.0, -0.3], atol=1e-9)

    # cam sweep chain: keyframe first (stripped by the dataset), then
    # the non-key sweep
    chain = i1["cam_sweeps_info"]["CAM_FRONT"]
    assert len(chain) == 2
    assert chain[0]["data_path"].endswith("cf_1.jpg")
    assert chain[1]["data_path"].endswith("cf_sw.jpg")

    # GT: car at global x=10, ego at 0 -> lidar x=10, z = 1.0-1.8 ctr
    g = i0["gt_boxes"][0]
    np.testing.assert_allclose(g[:3], [10.0, 0.0, -0.8], atol=1e-9)
    np.testing.assert_allclose(g[3:6], [4.0, 2.0, 1.5], atol=1e-9)  # lwh
    assert i0["gt_names"][0] == "car"
    # velocity: +1 m in 0.5 s -> 2 m/s in x (one-sided diff both ends)
    np.testing.assert_allclose(i0["gt_velocity"][0], [2.0, 0.0],
                               atol=1e-9)
    np.testing.assert_allclose(i1["gt_velocity"][0], [2.0, 0.0],
                               atol=1e-9)
    assert bool(i0["valid_flag"][0])

    # lidar2img consistency: project the GT center through the dataset's
    # matrix and through explicit geometry
    from uni3detr_tpu.data.datasets import _lidar2img
    l2i = _lidar2img(cf)
    p = np.array([10.0, 0.0, -0.8, 1.0])
    uvzw = p @ l2i.T
    cam_pt = CAM_R.T @ (p[:3] - np.array([1.5, 0.0, -0.3]))
    uv_ref = (K @ cam_pt)[:2] / cam_pt[2]
    np.testing.assert_allclose(uvzw[:2] / uvzw[2], uv_ref, atol=1e-4)
    assert abs(uvzw[2] - cam_pt[2]) < 1e-4


@pytest.mark.slow  # converter->OV-forward integration; 55 s of XLA
def test_converted_infos_to_ov_forward(tmp_path):
    """info pkl -> dataset (use_camera) -> multi-sweep loader -> collate
    -> OV multimodal forward on a tiny config."""
    import dataclasses
    import jax
    from uni3detr_tpu.data.nuscenes_converter import create_nuscenes_infos
    from uni3detr_tpu.data.datasets import DetDataset, collate_batch
    from test_ov import OV_TINY

    root = str(tmp_path)
    version = _write_fixture(root)
    create_nuscenes_infos(root, version)
    pipeline = [
        dict(type="LoadMultiViewMultiSweepImageFromFiles", sweep_num=2),
        dict(type="NormalizeImage"),
        dict(type="PadImage", size=(32, 32)),
        dict(type="LoadPointsFromMultiSweeps", sweeps_num=2, load_dim=5,
             use_dim=(0, 1, 2, 3)),
        dict(type="PointSample", num_points=512),
    ]
    ds = DetDataset(root, "nuscenes_infos_train.pkl", pipeline,
                    ["car"], (-50, -50, -5, 50, 50, 3),
                    dataset_type="nuscenes", box_type="LiDAR",
                    load_dim=5, use_dim=(0, 1, 2, 3), use_camera=True,
                    test_mode=True)
    s = ds[1]
    # 2 cams x 2 sweeps, sweep-major
    assert s["images"].shape == (4, 32, 32, 3)
    assert s["lidar2img"].shape == (4, 4, 4)
    assert s["sweep_times"].shape == (2,)
    assert s["sweep_times"][1] > 0
    assert s["gt_boxes"].shape[1] == 9  # velocity appended
    # bottom-z storage: center z -0.8 - h/2
    np.testing.assert_allclose(s["gt_boxes"][0, 2], -1.55, atol=1e-5)

    batch, metas = collate_batch([ds[0], ds[1]], 512, 4, 4, code_size=10)
    assert batch["images"].shape == (2, 4, 32, 32, 3)
    assert batch["sweep_times"].shape == (2, 2)

    cfg = dataclasses.replace(
        OV_TINY, code_size=10, in_point_features=4,
        pc_range=(-50, -50, -5, 50, 50, 3),
        voxel_size=(3.125, 3.125, 1.0),
        img_size=(32, 32), num_cams=2, num_sweeps=2)
    from uni3detr_tpu.models.ov_detector import OV_Uni3DETR
    model = OV_Uni3DETR(cfg, zs_init=np.ones(
        (cfg.num_classes, cfg.clip_dim), np.float32))
    jb = {k: jax.numpy.asarray(v) for k, v in batch.items()
          if k not in ("gt_boxes", "gt_labels", "gt_mask")}
    rp = jax.random.uniform(jax.random.PRNGKey(2), (2, cfg.num_query, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "modality": jax.random.PRNGKey(1)},
        jb, train=False, random_points=rp)
    out = model.apply(variables, jb, train=False, random_points=rp)
    assert np.isfinite(np.asarray(out["all_cls_scores"])).all()
