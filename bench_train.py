"""Training-step throughput benchmark (not driver-facing; see bench.py
for the headline inference metric).

Runs the full jitted train step — forward, on-device Pallas auction
matching, losses, backward, AdamW — on the flagship SUN RGB-D config with
synthetic scenes at real budgets, and prints steps/sec + scenes/sec.
"""
import json
import time

import numpy as np


def main(batch_size=2, iters=10):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_compilation_cache", False)  # axon perf
    from uni3detr_tpu.presets import SUNRGBD
    from uni3detr_tpu.train.step import (create_train_state,
                                         make_train_step, make_optimizer)

    cfg = SUNRGBD
    B, P, G = batch_size, cfg.num_points, cfg.max_gt
    rng = np.random.RandomState(0)
    lo = np.array(cfg.pc_range[:3])
    hi = np.array(cfg.pc_range[3:])
    boxes = np.concatenate([
        rng.uniform(lo + 0.5, hi - 0.5, (B, G, 3)),
        rng.uniform(0.3, 1.5, (B, G, 3)),
        rng.uniform(-np.pi, np.pi, (B, G, 1))], -1).astype(np.float32)
    pts = rng.uniform(lo, hi, (B, P, 3)).astype(np.float32)
    pts = np.concatenate([pts, np.zeros((B, P, 1), np.float32)], -1)
    batch = {"points": pts, "pts_mask": np.ones((B, P), bool),
             "gt_boxes": boxes,
             "gt_labels": rng.randint(0, 10, (B, G)).astype(np.int32),
             "gt_mask": np.ones((B, G), bool)}

    tx = make_optimizer(1e-4)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch, tx)
    step = make_train_step(cfg, donate=False)
    state, logs = step(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(logs["total_loss"])
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        state, logs = step(state, batch, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(logs["total_loss"])
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(json.dumps({
        "metric": "sunrgbd_train_scenes_per_sec",
        "value": round(B / dt, 3),
        "unit": "scenes/sec/chip",
        "step_seconds": round(dt, 4),
        "loss": round(float(logs["total_loss"]), 4),
    }))


if __name__ == "__main__":
    main()
