"""OV camera-branch data loading end-to-end on a synthetic SUN RGB-D
fixture (info pkl with image + calib), through dataset -> pipeline ->
collate -> OV model forward."""
import pytest
import dataclasses
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp


def _write_sunrgbd_fixture(root, n=2):
    os.makedirs(os.path.join(root, "points"), exist_ok=True)
    os.makedirs(os.path.join(root, "image"), exist_ok=True)
    rng = np.random.RandomState(0)
    infos = []
    from PIL import Image
    for i in range(n):
        pts = rng.uniform(-1.5, 1.5, (800, 6)).astype(np.float32)
        pts.tofile(os.path.join(root, f"points/{i:06d}.bin"))
        img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, f"image/{i:06d}.jpg"))
        infos.append({
            "pts_path": f"points/{i:06d}.bin",
            "image": {"image_path": f"image/{i:06d}.jpg",
                      "image_shape": (32, 32)},
            "calib": {"K": np.array([[20, 0, 16], [0, 20, 16], [0, 0, 1]],
                                    np.float32),
                      "Rt": np.eye(3, dtype=np.float32)},
            "annos": {
                "gt_boxes_upright_depth": np.array(
                    [[0.2, 0.5, -0.5, 0.8, 0.6, 0.7, 0.3]], np.float32),
                "name": ["a"],
            },
        })
    with open(os.path.join(root, "sunrgbd_infos_val.pkl"), "wb") as f:
        pickle.dump(infos, f)


@pytest.mark.slow  # dataset->OV-forward integration; 43 s of XLA
def test_ov_camera_dataset_to_forward(tmp_path):
    from uni3detr_tpu.data.datasets import DetDataset, collate_batch
    from uni3detr_tpu.models.ov_detector import OV_Uni3DETR
    from test_ov import OV_TINY

    root = str(tmp_path)
    _write_sunrgbd_fixture(root)
    pipeline = [
        dict(type="LoadImageFromFile"),
        dict(type="NormalizeImage"),
        dict(type="PadImage", size_divisor=32),
        dict(type="PointsRangeFilter"),
        dict(type="PointSample", num_points=512),
    ]
    ds = DetDataset(root, "sunrgbd_infos_val.pkl", pipeline,
                    ["a", "b", "c"], OV_TINY.pc_range,
                    dataset_type="sunrgbd", load_dim=6, use_dim=(0, 1, 2),
                    use_camera=True, test_mode=True)
    s = ds[0]
    assert s["images"].shape == (1, 32, 32, 3)
    assert s["lidar2img"].shape == (1, 4, 4)
    batch, metas = collate_batch([s, ds[1]], OV_TINY.num_points,
                                 OV_TINY.max_gt,
                                 OV_TINY.in_point_features)
    assert batch["images"].shape == (2, 1, 32, 32, 3)

    model = OV_Uni3DETR(OV_TINY)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    rp = jnp.full((2, OV_TINY.num_query, 3), 0.5)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "modality": jax.random.PRNGKey(1)},
                           jb, train=False, random_points=rp))()
    out = model.apply(variables, jb, train=False, random_points=rp)
    assert np.isfinite(np.asarray(out["all_cls_scores"])).all()


def test_post_processing_validated():
    import pathlib
    import pytest
    from uni3detr_tpu.config import (load_config, merge_cfg_options,
                                     build_model_config)
    REPO = pathlib.Path(__file__).resolve().parents[1]
    cfg = load_config(
        str(REPO / "configs/uni3detr/uni3detr_synthetic_tiny.py"))
    cfg = merge_cfg_options(cfg, ["model.post_processing=bogus"])
    with pytest.raises(ValueError):
        build_model_config(cfg)
