"""Spatial-sharding measurement on a virtual 8-device CPU mesh.

Answers VERDICT round-1 weak #9b with data: for a KITTI-scale dense voxel
grid, compare mesh layouts (data=8, spatial=1) vs (data=4, spatial=2) vs
(data=2, spatial=4) on:
- train-step wall time (8 virtual CPU devices — relative, not absolute,
  but the collective/halo overhead shows up);
- per-device peak memory from XLA's compiled memory analysis (the real
  motivation: the reference's [41, 1600, 1408] grid is its single-GPU
  memory hot spot, and spatial sharding divides the dense-volume
  activations).

Run: ``env JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8
python tools/measure_spatial_sharding.py``
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# jax is pre-imported on the axon platform by sitecustomize; force the
# platform through jax.config before any backend initializes (the same
# trick tests/conftest.py uses)
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_STEPS = 8


def measure(spatial: int):
    import jax
    import jax.numpy as jnp
    from uni3detr_tpu.models.config import Uni3DETRConfig
    from uni3detr_tpu.parallel.mesh import (make_mesh, shard_batch,
                                            replicate, set_active_mesh)
    from uni3detr_tpu.train.step import (create_train_state,
                                         make_train_step, make_optimizer)

    n = 8
    mesh = make_mesh(n, spatial=spatial)
    data = n // spatial
    # KITTI-proportioned grid scaled down so 8 CPU "devices" can execute
    # it, but big enough that the dense volume dominates activations
    cfg = Uni3DETRConfig(
        num_classes=3, code_size=8,
        pc_range=(0.0, -25.6, -3.0, 38.4, 25.6, 1.0),
        voxel_size=(0.1, 0.1, 0.1), grid_size=(40, 512, 384),
        max_points_per_voxel=5, max_voxels=4096, max_voxels_test=4096,
        in_point_features=4,
        encoder_base_channels=8, encoder_out_channels=64,
        encoder_channels=((8, 8, 16), (16, 16, 32), (32, 32, 64),
                          (64, 64)),
        encoder_downsample_paddings=((1, 1, 1), (1, 1, 1), (0, 1, 1)),
        backbone_channels=(32, 64, 128), backbone_layers=(2, 2, 2),
        neck_channels=(64, 64, 64),
        num_query=100, embed_dim=64, num_decoder_layers=2, num_heads=4,
        ffn_dim=128, max_gt=16, max_num=64, num_points=8192,
        post_center_range=(0.0, -20.0, -3.0, 35.2, 20.0, 1.0))

    B, P, G = data, cfg.num_points, cfg.max_gt
    rng = np.random.RandomState(0)
    lo = np.array(cfg.pc_range[:3])
    hi = np.array(cfg.pc_range[3:])
    pts = rng.uniform(lo, hi, (B, P, 3)).astype(np.float32)
    pts = np.concatenate([pts, rng.rand(B, P, 1).astype(np.float32)], -1)
    batch = {
        "points": pts,
        "pts_mask": np.ones((B, P), bool),
        "gt_boxes": np.concatenate([
            rng.uniform(lo + 2, hi - 2, (B, G, 3)),
            rng.uniform(1, 4, (B, G, 3)),
            rng.uniform(-np.pi, np.pi, (B, G, 1))], -1).astype(np.float32),
        "gt_labels": rng.randint(0, 3, (B, G)).astype(np.int32),
        "gt_mask": np.ones((B, G), bool),
    }

    set_active_mesh(mesh)
    try:
        tx = make_optimizer(1e-4)
        state = create_train_state(cfg, jax.random.PRNGKey(0), batch, tx)
        state = state.replace(
            params=replicate(state.params, mesh),
            batch_stats=replicate(state.batch_stats, mesh),
            opt_state=replicate(state.opt_state, mesh),
            step=jax.device_put(state.step))
        sharded = shard_batch(batch, mesh)
        step = make_train_step(cfg, donate=False)
        lowered = step.lower(state, sharded, jax.random.PRNGKey(1))
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        peak_mb = None
        if mem is not None:
            peak_mb = round((mem.temp_size_in_bytes
                             + mem.argument_size_in_bytes
                             + mem.output_size_in_bytes) / 2**20, 1)
        state, logs = compiled(state, sharded, jax.random.PRNGKey(1))
        jax.block_until_ready(logs["total_loss"])
        t0 = time.perf_counter()
        for _ in range(N_STEPS):
            state, logs = compiled(state, sharded, jax.random.PRNGKey(1))
        jax.block_until_ready(logs["total_loss"])
        ms = (time.perf_counter() - t0) / N_STEPS * 1e3
        return {"mesh": f"data={data},spatial={spatial}",
                "global_batch": B,
                "ms_per_step": round(ms, 1),
                "ms_per_scene": round(ms / B, 1),
                "per_device_program_mb": peak_mb,
                "loss": round(float(logs["total_loss"]), 3)}
    finally:
        set_active_mesh(None)


def main():
    for spatial in (1, 2, 4):
        print(json.dumps(measure(spatial)))


if __name__ == "__main__":
    main()
