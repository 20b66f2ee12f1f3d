"""End-to-end inference benchmark: scenes/sec on the flagship SUN RGB-D
config (voxelize -> sparse encoder -> backbone/FPN -> 4-group decoder ->
NMS-free decode -> per-class rotated NMS).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput (BASELINE.md); vs_baseline uses a
nominal 10 scenes/sec for the reference single-GPU mmdet3d pipeline at
batch 1 (typical published mmdet3d indoor-detector inference speed).
"""
import json
import time

import numpy as np

REF_SCENES_PER_SEC = 10.0


def main():
    import jax
    # executables deserialized from the persistent compilation cache run
    # through a pathologically slow path on the axon TPU backend
    # (measured 1.8 s/call vs 1 ms freshly compiled) — always compile fresh
    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp
    from uni3detr_tpu.models.detector import Uni3DETR
    from uni3detr_tpu.presets import SUNRGBD
    from uni3detr_tpu.train.coder import decode_predictions, post_process

    cfg = SUNRGBD
    model = Uni3DETR(cfg)
    B, P = 1, cfg.num_points
    rng = np.random.RandomState(0)
    lo = np.array(cfg.pc_range[:3])
    hi = np.array(cfg.pc_range[3:])
    pts = rng.uniform(lo, hi, (B, P, 3)).astype(np.float32)
    points = jnp.asarray(pts)
    pts_mask = jnp.ones((B, P), bool)
    rp = jnp.asarray(rng.rand(B, cfg.num_query, 3).astype(np.float32))

    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, points,
                           pts_mask, train=False, random_points=rp))

    # IMPORTANT (axon backend): initialize in ONE jitted program. Hundreds
    # of separate small program executions/allocations permanently degrade
    # subsequent large-program execution ~2000x on this runtime.
    def initfn(key):
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        keys = jax.random.split(key, len(leaves))
        return jax.tree_util.tree_unflatten(treedef, [
            (jax.random.normal(k, s.shape, jnp.float32).astype(s.dtype)
             * 0.02 if jnp.issubdtype(s.dtype, jnp.floating)
             else jnp.zeros(s.shape, s.dtype))
            for k, s in zip(keys, leaves)])

    variables = jax.jit(initfn)(jax.random.PRNGKey(42))

    @jax.jit
    def infer(variables, points, pts_mask, rp):
        outs = model.apply(variables, points, pts_mask, train=False,
                           random_points=rp)
        boxes, scores, labels, valid = decode_predictions(outs, cfg)
        return post_process(boxes, scores, labels, valid, cfg)

    # compile + warmup
    out = infer(variables, points, pts_mask, rp)
    jax.block_until_ready(out)
    for _ in range(3):
        out = infer(variables, points, pts_mask, rp)
    jax.block_until_ready(out)
    times = []
    for _ in range(50):
        t0 = time.perf_counter()
        out = infer(variables, points, pts_mask, rp)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    scenes_per_sec = B / float(np.median(times))

    print(json.dumps({
        "metric": "sunrgbd_e2e_inference_scenes_per_sec",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/sec/chip",
        "vs_baseline": round(scenes_per_sec / REF_SCENES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
