"""Race the sparse encoder's two executions at a preset's eval budget.

``gather`` (Pallas windowed one-hot kernels + counting matcher) vs
``dense`` (scatter once, masked XLA 3D convs — no rulebooks at all;
semantics deltas documented in SparseEncoderHD._dense_forward). Both
run the same clustered input; chained-scan timing (bench.py
methodology).

Run: ``python tools/measure_encoder_impl.py [preset] [n_iters]``.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(preset="uni3detr_sunrgbd", n_iters=20):
    import jax
    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp
    from uni3detr_tpu.presets import PRESETS
    from uni3detr_tpu.models.sparse_encoder import SparseEncoderHD
    from uni3detr_tpu.ops.voxelize import hard_voxelize

    cfg = PRESETS[preset]
    rng = np.random.RandomState(0)
    B, P = 1, cfg.num_points
    lo = np.asarray(cfg.pc_range[:3], np.float32)
    span = np.asarray(cfg.pc_range[3:], np.float32) - lo
    K = 24
    centers = lo + span * (0.1 + 0.8 * rng.rand(K, 3))
    assign = rng.randint(0, K, P)
    pts = centers[assign] + rng.randn(P, 3) * span * 0.02
    pts = np.clip(pts, lo + 1e-4, lo + span - 1e-3).astype(np.float32)
    pts = np.concatenate(
        [pts, rng.rand(P, cfg.in_point_features - 3).astype(np.float32)],
        -1)[None]
    mask = np.ones((B, P), bool)

    feats, coords, vmask = jax.jit(lambda p, m: hard_voxelize(
        p, m, pc_range=tuple(cfg.pc_range),
        voxel_size=tuple(cfg.voxel_size), grid_size=tuple(cfg.grid_size),
        max_points=cfg.max_points_per_voxel,
        max_voxels=cfg.max_voxels_test))(jnp.asarray(pts),
                                         jnp.asarray(mask))
    jax.block_until_ready(feats)

    for impl in ("gather", "dense"):
        enc = SparseEncoderHD(
            sparse_shape=tuple(cfg.grid_size),
            base_channels=cfg.encoder_base_channels,
            output_channels=cfg.encoder_out_channels,
            encoder_channels=cfg.encoder_channels,
            downsample_paddings=cfg.encoder_downsample_paddings,
            compute_dtype=cfg.jnp_compute_dtype, impl=impl)
        try:
            variables = jax.jit(lambda f, c, m: enc.init(
                jax.random.PRNGKey(0), f, c, m, False))(feats, coords,
                                                        vmask)

            def step(x, i):
                key = jax.random.fold_in(jax.random.PRNGKey(0), i)
                xp = x + jax.nn.relu(
                    jax.random.uniform(key, (), x.dtype) * 1e-6)
                vol, _ = enc.apply(variables, xp, coords, vmask, False)
                carry = x + (vol.astype(jnp.float32).ravel()[::4097][:8]
                             .sum() * 1e-20).astype(x.dtype)
                return carry, vol.astype(jnp.float32).ravel()[0]

            prog = jax.jit(lambda x: jax.lax.scan(
                step, x, jnp.arange(n_iters))[1])
            jax.block_until_ready(prog(feats))
            t0 = time.perf_counter()
            jax.block_until_ready(prog(feats))
            dt = (time.perf_counter() - t0) / n_iters * 1e3
            print(f"{preset} encoder impl={impl:7s} {dt:8.2f} ms")
        except Exception as e:  # noqa: BLE001 - report and keep racing
            print(f"{preset} encoder impl={impl:7s} FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*( (a[0],) if a else () ), *(int(v) for v in a[1:]))
