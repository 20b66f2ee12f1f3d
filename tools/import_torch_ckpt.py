"""Convert a released Uni3DETR torch checkpoint (.pth) into an orbax
checkpoint loadable by ``cli/test.py`` / ``cli/train.py --resume-from``.

Usage:
    python tools/import_torch_ckpt.py CKPT.pth OUT_DIR \
        --preset uni3detr_sunrgbd [--no-verify]

The mapping (uni3detr_tpu/train/torch_import.py) covers the full
Uni3DETR detector (sparse encoder, SECOND3D backbone, SECOND3DFPN neck,
DETR head/decoder) and, for ``ov_*`` presets, the OV_Uni3DETR layout
(ResNet+DCN image backbone, FPN, input_proj/depth_net, view transform,
fusion conv, CLIP head with zs_weights constants; reference key layout
cited there). With verification on (default), the imported tree is
structurally checked against ``model.init`` — every leaf path and shape
must match.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("out_dir")
    ap.add_argument("--preset", default="uni3detr_sunrgbd")
    ap.add_argument("--no-verify", action="store_true",
                    help="skip the model.init structural check (slow on "
                         "large grids)")
    args = ap.parse_args()

    import numpy as np
    import torch

    from uni3detr_tpu.presets import PRESETS
    from uni3detr_tpu.train.torch_import import (import_torch_state_dict,
                                                 import_torch_state_dict_ov,
                                                 check_structure)

    cfg = PRESETS[args.preset]
    is_ov = args.preset.startswith("ov_")
    raw = torch.load(args.ckpt, map_location="cpu")
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    meta = raw.get("meta", {}) if isinstance(raw, dict) else {}

    variables = (import_torch_state_dict_ov if is_ov
                 else import_torch_state_dict)(sd, cfg)
    n_params = sum(int(np.prod(v.shape)) for v in
                   __import__("jax").tree_util.tree_leaves(
                       variables["params"]))
    print(f"imported {n_params/1e6:.2f}M params from {args.ckpt}")

    if not args.no_verify:
        import jax
        import jax.numpy as jnp
        rnd = jnp.full((1, cfg.num_query, 3), 0.5, jnp.float32)
        if is_ov:
            from uni3detr_tpu.models.ov_detector import OV_Uni3DETR
            model = OV_Uni3DETR(cfg)
            batch = {}
            if cfg.use_lidar:
                batch["points"] = jnp.zeros(
                    (1, 512, cfg.in_point_features), jnp.float32)
                batch["pts_mask"] = jnp.ones((1, 512), bool)
            if cfg.use_camera:
                H, W = cfg.img_size
                batch["images"] = jnp.zeros((1, cfg.num_cams, H, W, 3),
                                            jnp.float32)
                batch["lidar2img"] = jnp.broadcast_to(
                    jnp.eye(4), (1, cfg.num_cams, 4, 4))
                batch["uni_rot_aug"] = jnp.broadcast_to(jnp.eye(3),
                                                        (1, 3, 3))
            ref_vars = jax.eval_shape(
                lambda: model.init(
                    {"params": jax.random.PRNGKey(0),
                     "modality": jax.random.PRNGKey(1)},
                    batch, train=False, random_points=rnd))
        else:
            from uni3detr_tpu.models.detector import Uni3DETR
            model = Uni3DETR(cfg)
            pts = jnp.zeros((1, 512, cfg.in_point_features), jnp.float32)
            mask = jnp.ones((1, 512), bool)
            ref_vars = jax.eval_shape(
                lambda: model.init(jax.random.PRNGKey(0), pts, mask,
                                   train=False, random_points=rnd))
        missing, extra, mismatched = check_structure(
            {k: variables[k] for k in ("params", "batch_stats")}, ref_vars)
        if missing or extra or mismatched:
            raise SystemExit(
                f"structure check FAILED:\n missing={missing[:6]}\n "
                f"extra={extra[:6]}\n mismatched={mismatched[:6]}")
        print("structure check passed (leaf paths + shapes match init)")

    from uni3detr_tpu.train.checkpoint import save_checkpoint

    class _S:
        params = variables["params"]
        batch_stats = variables["batch_stats"]
        opt_state = {}
        step = np.zeros((), np.int32)
        constants = variables.get("constants")

    save_checkpoint(args.out_dir, _S(),
                    meta={"imported_from": os.path.abspath(args.ckpt),
                          "preset": args.preset,
                          "torch_meta_keys": sorted(meta)
                          if isinstance(meta, dict) else []})
    print(f"saved orbax checkpoint at {args.out_dir}")


if __name__ == "__main__":
    main()
