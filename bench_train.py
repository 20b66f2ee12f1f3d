"""Training-step throughput benchmark (not driver-facing; see bench.py
for the headline inference metric).

Runs the full jitted train step — forward, on-device Pallas auction
matching, losses, backward, AdamW — on the flagship SUN RGB-D config
with synthetic scenes at real budgets.

Methodology matches bench.py: N steps chained through the optimizer
state inside ONE ``lax.scan`` program (strictly sequential, uncacheable,
immune to the axon runtime's broken ``block_until_ready``), FLOPs from
XLA cost analysis, and a hard assert that the implied TFLOP/s is below
chip peak.
"""
import json
import sys
import time

import numpy as np

from bench import chip_peak_tflops, require_device

N_STEPS = 5


def main(preset: str = "uni3detr_sunrgbd", batch_size=2):
    require_device()
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_compilation_cache", False)  # axon perf
    from uni3detr_tpu.presets import PRESETS
    from uni3detr_tpu.train.step import (create_train_state,
                                         make_train_step, make_optimizer)

    cfg = PRESETS[preset]
    B, P, G = batch_size, cfg.num_points, cfg.max_gt
    rng = np.random.RandomState(0)
    lo = np.array(cfg.pc_range[:3])
    hi = np.array(cfg.pc_range[3:])
    parts = [rng.uniform(lo + 0.5, hi - 0.5, (B, G, 3)),
             rng.uniform(0.3, 1.5, (B, G, 3)),
             rng.uniform(-np.pi, np.pi, (B, G, 1))]
    if cfg.code_size > 8:
        parts.append(rng.uniform(-2, 2, (B, G, 2)))  # velocity
    boxes = np.concatenate(parts, -1).astype(np.float32)
    pts = rng.uniform(lo, hi, (B, P, 3)).astype(np.float32)
    extra = cfg.in_point_features - 3
    pts = np.concatenate([pts, np.zeros((B, P, extra), np.float32)], -1)
    batch = {"points": pts, "pts_mask": np.ones((B, P), bool),
             "gt_boxes": boxes,
             "gt_labels": rng.randint(0, cfg.num_classes,
                                      (B, G)).astype(np.int32),
             "gt_mask": np.ones((B, G), bool)}

    tx = make_optimizer(1e-4)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch, tx)
    step = make_train_step(cfg, donate=False)

    batch_dev = jax.device_put(batch)

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(state, key, n=N_STEPS):
        def body(carry, i):
            st, _ = carry
            st, logs = step(st, batch_dev, jax.random.fold_in(key, i))
            return (st, logs["total_loss"]), ()
        (st, loss), _ = jax.lax.scan(
            body, (state, jnp.float32(0.0)), jnp.arange(n))
        return loss

    # flops of one step = scan-program flops / N (avoids a second large
    # compile of the bare step; the scan body IS the step)
    flops = 0.0
    lowered = run.lower(state, jax.random.PRNGKey(1), N_STEPS)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", 0.0)) / N_STEPS
    except Exception:
        pass

    # warmups (host fetch forces true completion), then time the N-step
    # and 2N-step programs and difference — cancels the constant
    # dispatch + tunnel-fetch overhead (~30 ms on axon; at N=5 that
    # would otherwise inflate the step by ~6 ms)
    loss = float(np.asarray(run(state, jax.random.PRNGKey(1), N_STEPS)))
    float(np.asarray(run(state, jax.random.PRNGKey(3), 2 * N_STEPS)))
    t0 = time.perf_counter()
    loss = float(np.asarray(run(state, jax.random.PRNGKey(2), N_STEPS)))
    t1 = time.perf_counter()
    float(np.asarray(run(state, jax.random.PRNGKey(4), 2 * N_STEPS)))
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / N_STEPS

    kind = jax.devices()[0].device_kind
    peak = chip_peak_tflops(kind)
    implied_tflops = flops / dt / 1e12 if flops else 0.0
    assert implied_tflops < peak, (
        f"implied {implied_tflops:.1f} TFLOP/s exceeds {kind} peak {peak}"
        " — measurement is broken, refusing to report")
    print(json.dumps({
        "metric": ("sunrgbd_train_scenes_per_sec"
                   if preset == "uni3detr_sunrgbd"
                   else f"{preset}_train_scenes_per_sec"),
        "value": round(B / dt, 3),
        "unit": "scenes/sec/chip",
        "step_seconds": round(dt, 4),
        "gflops_per_step": round(flops / 1e9, 1),
        "implied_tflops": round(implied_tflops, 2),
        "mfu": round(implied_tflops / peak, 5),
        "chip": kind,
        "loss": round(loss, 4),
    }))


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["uni3detr_sunrgbd"]),
         batch_size=int(sys.argv[2]) if len(sys.argv) > 2 else 2)
