"""Split the sparse encoder's e2e cost into rulebook-building vs convs.

Times (bench.py chained-scan methodology, honest on axon):
  A. full encoder apply (rulebooks built in-program, eval mode);
  B. encoder body with ALL rulebooks/site-sets precomputed and passed in
     (only convs + BN + densify execute);
  C. the rulebook pipeline alone (tables + subm/strided lookups +
     downsample site sets for all stages).
A - B ~= C localizes where encoder time goes.

Run: ``python tools/profile_encoder_split.py [preset] [n_iters]``.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_ITERS = 20


def main(preset="uni3detr_sunrgbd", n_iters=N_ITERS):
    import jax
    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp
    from uni3detr_tpu.presets import PRESETS
    from uni3detr_tpu.models.sparse_encoder import SparseEncoderHD
    from uni3detr_tpu.ops.sparse_conv import (
        build_position_table, subm_neighbor_idx, strided_neighbor_idx,
        downsample_sites)
    from uni3detr_tpu.ops.voxelize import hard_voxelize

    cfg = PRESETS[preset]
    rng = np.random.RandomState(0)
    B, P = 1, cfg.num_points
    lo = np.asarray(cfg.pc_range[:3], np.float32)
    span = np.asarray(cfg.pc_range[3:], np.float32) - lo
    # clustered cloud (same spirit as bench.py)
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

    enc = SparseEncoderHD(
        sparse_shape=tuple(cfg.grid_size),
        base_channels=cfg.encoder_base_channels,
        output_channels=cfg.encoder_out_channels,
        encoder_channels=cfg.encoder_channels,
        downsample_paddings=cfg.encoder_downsample_paddings,
        budget_shrink=cfg.encoder_budget_shrink,
        budget_caps=cfg.encoder_budget_caps,
        compute_dtype=cfg.jnp_compute_dtype)
    variables = jax.jit(
        lambda f, c, m: enc.init(jax.random.PRNGKey(0), f, c, m, False)
    )(feats, coords, vmask)

    def full(f, c, m):
        return enc.apply(variables, f, c, m, False)[0]

    def rulebooks(c, m):
        """All site sets + rulebooks of the eval pass, as one program."""
        out = []
        grid = tuple(cfg.grid_size)
        V = c.shape[1]
        coords_, vmask_ = c, m
        n_stages = len(cfg.encoder_channels)
        shrink = (1.0, 0.5, 0.25)
        for i in range(n_stages):
            table = jax.vmap(build_position_table, in_axes=(0, 0, None))(
                coords_, vmask_, grid)
            nb = jax.vmap(subm_neighbor_idx,
                          in_axes=(0, 0, None, None, 0))(
                coords_, vmask_, grid, 3, table)
            out.append(nb)
            if i < n_stages - 1:
                pad = cfg.encoder_downsample_paddings[i]
                budget = max(int(V * shrink[i]), 256)
                nc, nm = jax.vmap(
                    lambda cc, mm: downsample_sites(
                        cc, mm, grid, pad, budget)[:2])(coords_, vmask_)
                ng = tuple((g + 2 * p - 3) // 2 + 1
                           for g, p in zip(grid, pad))
                sidx = jax.vmap(
                    strided_neighbor_idx,
                    in_axes=(0, 0, 0, 0, None, None, None, None, 0))(
                        nc, nm, coords_, vmask_, grid, pad, 2, 3, table)
                out.append(sidx)
                coords_, vmask_, grid = nc, nm, ng
        return out

    def timed(fn, args, perturb):
        @jax.jit
        def run(a):
            def body(a, i):
                out = fn(*a)
                return perturb(a, out, i), ()
            final, _ = jax.lax.scan(body, a, jnp.arange(n_iters))
            return final
        r = run(args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = run(args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n_iters * 1e3

    res = {}
    res["A_full_encoder"] = timed(
        full, (feats, coords, vmask),
        perturb=lambda a, out, i: (
            a[0] + out.astype(jnp.float32).sum() * 1e-9, a[1], a[2]))

    def leafsum(tree):
        s = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(tree):
            s += leaf.astype(jnp.float32).sum()
        return s

    res["C_rulebooks_only"] = timed(
        rulebooks, (coords, vmask),
        perturb=lambda a, out, i: (
            jnp.where((leafsum(out) > 1e30)[None, None],
                      a[0] + 1, a[0]), a[1]))

    print(json.dumps({"preset": preset,
                      "chip": jax.devices()[0].device_kind,
                      "V": int(coords.shape[1]),
                      "active": int(np.asarray(vmask.sum())),
                      "ms": {k: round(v, 2) for k, v in res.items()}}))


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["uni3detr_sunrgbd"]),
         n_iters=int(sys.argv[2]) if len(sys.argv) > 2 else N_ITERS)
