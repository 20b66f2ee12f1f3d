"""Round-5 encoder attribution on the REAL TPU eval path.

profile_stages.py gives the encoder's total; this splits it into the
components the gather path actually executes (models/sparse_encoder.py
``site_ctx`` dispatch):

  A. full encoder apply (eval, cfg budgets) — the reference number;
  B. site machinery alone: linear_ids + subm_query_ids + match_positions
     per stage, downsample_sites between stages, strided query ids +
     match_positions for the 3 strided convs (everything except convs/BN);
  C. downsample_sites alone (the per-stage argsorts);
  D. one positional packed conv at each stage's (V, C) shape — multiply
     by the stage's conv count to reconstruct the conv share.

Run: ``python tools/profile_encoder_r5.py [preset]`` on the TPU host.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_ITERS = 20


def main(preset="uni3detr_sunrgbd"):
    import jax
    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp
    from uni3detr_tpu.presets import PRESETS
    from uni3detr_tpu.models.sparse_encoder import SparseEncoderHD
    from uni3detr_tpu.ops.sparse_conv import (
        linear_ids, subm_query_ids, strided_query_ids,
        downsample_sites_auto as downsample_sites)
    from uni3detr_tpu.ops.sparse_conv_pallas import (match_positions,
                                                     _raw_packed)
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

    grid0 = tuple(cfg.grid_size)
    V0 = coords.shape[1]
    n_stages = len(cfg.encoder_channels)

    def stage_budget(i, V):
        b = -(-int(V * cfg.encoder_budget_shrink[i]) // 8) * 8
        if cfg.encoder_budget_caps is not None:
            b = min(b, cfg.encoder_budget_caps[i])
        return max(b, 256)

    def site_machinery(c, m):
        out = []
        grid, V = grid0, V0
        coords_, vmask_ = c, m
        for i in range(n_stages):
            ids = jax.vmap(linear_ids, in_axes=(0, 0, None))(
                coords_, vmask_, grid)
            qids = jax.vmap(subm_query_ids, in_axes=(0, 0, None))(
                coords_, vmask_, grid)
            out.append(match_positions(ids, qids, V))
            if i < n_stages - 1:
                pad = cfg.encoder_downsample_paddings[i]
                budget = stage_budget(i, V0)
                nc, nm = jax.vmap(
                    lambda cc, mm: downsample_sites(cc, mm, grid, pad,
                                                    budget)[:2])(
                    coords_, vmask_)
                ng = tuple((g + 2 * p - 3) // 2 + 1
                           for g, p in zip(grid, pad))
                sq = jax.vmap(strided_query_ids,
                              in_axes=(0, 0, None, None))(nc, nm, grid,
                                                          pad)
                out.append(match_positions(ids, sq, V))
                coords_, vmask_, grid, V = nc, nm, ng, budget
        return out

    def downsamples_only(c, m):
        out = []
        grid, V = grid0, V0
        coords_, vmask_ = c, m
        for i in range(n_stages - 1):
            pad = cfg.encoder_downsample_paddings[i]
            budget = stage_budget(i, V0)
            nc, nm = jax.vmap(
                lambda cc, mm: downsample_sites(cc, mm, grid, pad,
                                                budget)[:2])(coords_,
                                                             vmask_)
            grid = tuple((g + 2 * p - 3) // 2 + 1
                         for g, p in zip(grid, pad))
            out.append(nc)
            coords_, vmask_, V = nc, nm, budget
        return out

    def timed(fn, args, perturb):
        # host-fetch timing, 2N-minus-N overhead cancellation (axon:
        # block_until_ready alone does not reliably wait; bench.py's
        # "host fetch forces true completion")
        import functools as _ft

        @_ft.partial(jax.jit, static_argnames=("n",))
        def run(a, n):
            def body(a, i):
                out = fn(*a)
                return perturb(a, out, i), ()
            final, _ = jax.lax.scan(body, a, jnp.arange(n))
            return jax.tree_util.tree_leaves(final)[0].astype(
                jnp.float32).ravel()[0]
        float(np.asarray(run(args, N_ITERS)))
        float(np.asarray(run(args, 2 * N_ITERS)))
        t0 = time.perf_counter()
        float(np.asarray(run(args, N_ITERS)))
        t1 = time.perf_counter()
        float(np.asarray(run(args, 2 * N_ITERS)))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / N_ITERS * 1e3

    def leafsum(tree):
        s = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(tree):
            s += leaf.astype(jnp.float32).sum()
        return s

    res = {}
    res["A_full_encoder"] = timed(
        lambda f, c, m: enc.apply(variables, f, c, m, False)[0],
        (feats, coords, vmask),
        perturb=lambda a, out, i: (
            (a[0] + out.astype(jnp.float32).sum() * 1e-9
             ).astype(a[0].dtype), a[1], a[2]))
    res["B_site_machinery"] = timed(
        site_machinery, (coords, vmask),
        perturb=lambda a, out, i: (
            jnp.where((leafsum(out) > 1e30)[None, None], a[0] + 1, a[0]),
            a[1]))
    res["C_downsamples_only"] = timed(
        downsamples_only, (coords, vmask),
        perturb=lambda a, out, i: (
            jnp.where((leafsum(out) > 1e30)[None, None], a[0] + 1, a[0]),
            a[1]))

    # D: one positional packed conv per stage shape
    dtype = cfg.jnp_compute_dtype
    per_stage = {}
    grid, V = grid0, V0
    coords_, vmask_ = coords, vmask
    chans = [cfg.encoder_channels[i][0] for i in range(n_stages)]
    n_convs = [2 * len(b[:-1] if i < n_stages - 1 else b)
               for i, b in enumerate(cfg.encoder_channels)]
    n_convs[0] += 1
    for i in range(n_stages):
        C = chans[i]
        ids = jax.vmap(linear_ids, in_axes=(0, 0, None))(coords_, vmask_,
                                                         grid)
        qids = jax.vmap(subm_query_ids, in_axes=(0, 0, None))(
            coords_, vmask_, grid)
        nb = jax.jit(lambda i_, q_: match_positions(i_, q_, V))(ids, qids)
        x = jnp.asarray(rng.randn(B, V, C).astype(np.float32)).astype(dtype)
        w = jnp.asarray((rng.randn(27, C, C) * 0.1).astype(
            np.float32)).astype(dtype)
        ms = timed(
            lambda x_, nb_, w_: _raw_packed(x_, nb_, w_), (x, nb, w),
            perturb=lambda a, out, i_: (
                (a[0] + out.astype(jnp.float32).sum() * 1e-9
                 ).astype(a[0].dtype), a[1], a[2]))
        per_stage[f"stage{i+1}_conv_ms(V={V},C={C})x{n_convs[i]}"] = \
            round(ms, 2)
        if i < n_stages - 1:
            pad = cfg.encoder_downsample_paddings[i]
            budget = stage_budget(i, V0)
            coords_, vmask_ = jax.vmap(
                lambda cc, mm: downsample_sites(cc, mm, grid, pad,
                                                budget)[:2])(coords_,
                                                             vmask_)
            grid = tuple((g + 2 * p - 3) // 2 + 1
                         for g, p in zip(grid, pad))
            V = budget
    res["D_per_stage_conv"] = per_stage
    conv_total = sum(
        float(v) * int(k.split("x")[-1])
        for k, v in per_stage.items())
    res["D_convs_reconstructed"] = round(conv_total, 2)
    print(json.dumps({"preset": preset,
                      "chip": jax.devices()[0].device_kind,
                      "V": int(V0),
                      "ms": {k: (v if isinstance(v, dict) else round(v, 2))
                             for k, v in res.items()}}))


if __name__ == "__main__":
    main(*sys.argv[1:2] or ["uni3detr_sunrgbd"])
