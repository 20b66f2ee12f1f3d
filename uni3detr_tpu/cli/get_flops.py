"""FLOPs / memory report: ``python -m uni3detr_tpu.cli.get_flops CONFIG``.

Equivalent of the reference extra_tools/get_flops.py, but via XLA's own
cost analysis of the compiled eval forward (the reference's mmcv counter
needs a forward_dummy the detectors never implemented).
"""
from __future__ import annotations

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--cfg-options", nargs="*", default=[])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from ..config import load_config, merge_cfg_options, build_model_config
    from ..models.config import OVUni3DETRConfig
    from ..train.step import build_model
    from ..utils.profiling import flops_of

    cfg = load_config(args.config)
    cfg = merge_cfg_options(cfg, args.cfg_options)
    mc = build_model_config(cfg)
    model = build_model(mc)
    B = args.batch
    batch = {
        "points": jnp.zeros((B, mc.num_points, mc.in_point_features)),
        "pts_mask": jnp.ones((B, mc.num_points), bool),
    }
    if isinstance(mc, OVUni3DETRConfig) and mc.use_camera:
        batch["images"] = jnp.zeros((B, mc.num_cams, *mc.img_size, 3))
        batch["lidar2img"] = jnp.tile(jnp.eye(4), (B, mc.num_cams, 1, 1))
        batch["uni_rot_aug"] = jnp.tile(jnp.eye(3), (B, 1, 1))
        if not mc.use_lidar:
            batch.pop("points"), batch.pop("pts_mask")
    rp = jnp.full((B, mc.num_query, 3), 0.5)
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "modality": jax.random.PRNGKey(1)},
                           *( (batch,) if isinstance(mc, OVUni3DETRConfig)
                              else (batch["points"], batch["pts_mask"])),
                           train=False, random_points=rp))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)

    def fwd(v):
        if isinstance(mc, OVUni3DETRConfig):
            return model.apply(v, batch, train=False, random_points=rp)
        return model.apply(v, batch["points"], batch["pts_mask"],
                           train=False, random_points=rp)

    n_params = sum(np.prod(x.shape) for x in
                   jax.tree_util.tree_leaves(variables["params"]))
    cost = flops_of(fwd, variables)
    print(f"params:        {n_params/1e6:.2f} M")
    print(f"forward flops: {cost['flops']/1e9:.2f} GFLOP (batch {B})")
    print(f"bytes moved:   {cost['bytes_accessed']/1e9:.2f} GB")


if __name__ == "__main__":
    main()
