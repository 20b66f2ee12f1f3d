"""Per-stage TPU timing of the flagship e2e inference.

The bench (bench.py) measures the whole pipeline; this tool jits each
stage as its own program and times it so optimization follows data, not
speculation (STATUS round-1 follow-up: "further pallas candidates should
follow profiling"). Stages:

  voxelize | encoder (sparse conv) | backbone+neck (dense convs) |
  fps_raw | fps_voxel | head (decoder+branches) | decode+nms

Each timed program chains a data dependence on its input each iteration
(same honest-scan methodology as bench.py).

Each stage also reports its roofline position (VERDICT r4 #2): FLOPs and
bytes-accessed from XLA's cost analysis of the compiled stage program,
the speed-of-light time under the chip's MXU peak and HBM bandwidth
(sol = max of the two), which roof binds, and measured/sol. XLA's
"bytes accessed" is post-fusion analytic traffic (operands + outputs of
fused computations), the right denominator for an HBM roof.

Run: ``python tools/profile_stages.py [preset]`` on the TPU machine.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_ITERS = 10

# (bf16 peak TFLOP/s, HBM GB/s) by device_kind substring
CHIP_ROOFS = {
    "v5 lite": (197.0, 819.0), "v5e": (197.0, 819.0),
    "v5p": (459.0, 2765.0), "v4": (275.0, 1228.0),
    "v6 lite": (918.0, 1638.0), "v6e": (918.0, 1638.0),
}


def chip_roofs(kind: str):
    kind = kind.lower()
    for key, roofs in CHIP_ROOFS.items():
        if key in kind:
            return roofs
    return (197.0, 819.0)


def stage_cost(fn, *args):
    """(flops, bytes accessed) from XLA cost analysis of jit(fn)(*args)."""
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0) or 0.0), \
        float(cost.get("bytes accessed", 0.0) or 0.0)


import jax  # noqa: E402  (module-level for stage_cost; conftest not in play)


def main():
    import jax
    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp
    from flax.core import FrozenDict
    from uni3detr_tpu.presets import PRESETS
    from uni3detr_tpu.models.detector import Uni3DETR, _minmax_norm
    from uni3detr_tpu.models.head import Uni3DETRHead
    from uni3detr_tpu.models.second3d import SECOND3D, SECOND3DFPN
    from uni3detr_tpu.models.sparse_encoder import SparseEncoderHD
    from uni3detr_tpu.ops.fps import farthest_point_sample
    from uni3detr_tpu.ops.voxelize import hard_voxelize
    from uni3detr_tpu.train.coder import decode_predictions, post_process

    name = sys.argv[1] if len(sys.argv) > 1 else "uni3detr_sunrgbd"
    cfg = PRESETS[name]
    dtype = cfg.jnp_compute_dtype
    model = Uni3DETR(cfg)
    B, P = 1, cfg.num_points
    rng = np.random.RandomState(0)
    lo = jnp.asarray(np.array(cfg.pc_range[:3], np.float32))
    span = jnp.asarray(np.array(cfg.pc_range[3:], np.float32)) - lo
    pts_mask = jnp.ones((B, P), bool)
    rp = jnp.asarray(rng.rand(B, cfg.num_query, 3).astype(np.float32))
    C = 3

    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((B, P, C), jnp.float32), pts_mask,
                           train=False, random_points=rp))

    def initfn(key):
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        keys = jax.random.split(key, len(leaves))
        return jax.tree_util.tree_unflatten(treedef, [
            (jax.random.normal(k, s.shape, jnp.float32).astype(s.dtype)
             * 0.02 if jnp.issubdtype(s.dtype, jnp.floating)
             else jnp.zeros(s.shape, s.dtype))
            for k, s in zip(keys, leaves)])

    variables = jax.jit(initfn)(jax.random.PRNGKey(42))
    params = variables["params"]
    stats = variables.get("batch_stats", FrozenDict())

    def sub(scope):
        v = {"params": params[scope]}
        if scope in stats:
            v["batch_stats"] = stats[scope]
        return v

    # clustered planar-patch distribution — the SAME input statistics the
    # bench measures (bench.py::make_xyz); uniform points leave every
    # voxel isolated, which mis-states the windowed sparse-conv cost.
    # Pass ``uniform`` as argv[2] to reproduce the old distribution.
    if len(sys.argv) > 2 and sys.argv[2] == "uniform":
        points = lo + span * jax.random.uniform(jax.random.PRNGKey(1),
                                                (B, P, 3))
    else:
        K = 24
        kc, ka, kn, kq = jax.random.split(jax.random.PRNGKey(1), 4)
        centers = lo + span * (0.1 + 0.8 * jax.random.uniform(
            kc, (B, K, 3)))
        assign = jax.random.randint(ka, (B, P), 0, K)
        offs = jax.random.normal(kn, (B, P, 3)) * span * 0.02
        axis = jax.random.randint(kq, (B, K), 0, 3)
        squash = 1.0 - 0.95 * jax.nn.one_hot(axis, 3)
        points = jnp.clip(
            jnp.take_along_axis(centers, assign[..., None], 1)
            + offs * jnp.take_along_axis(squash, assign[..., None], 1),
            lo + 1e-4, lo + span - 1e-3)

    # ---- stage programs (single-call; timed with chained perturbation)
    def s_voxelize(pts):
        return hard_voxelize(pts, pts_mask, pc_range=tuple(cfg.pc_range),
                             voxel_size=tuple(cfg.voxel_size),
                             grid_size=tuple(cfg.grid_size),
                             max_points=cfg.max_points_per_voxel,
                             max_voxels=cfg.max_voxels_test)

    enc = SparseEncoderHD(
        sparse_shape=tuple(cfg.grid_size),
        base_channels=cfg.encoder_base_channels,
        output_channels=cfg.encoder_out_channels,
        encoder_channels=cfg.encoder_channels,
        downsample_paddings=cfg.encoder_downsample_paddings,
        budget_shrink=cfg.encoder_budget_shrink,
        budget_caps=cfg.encoder_budget_caps,
        compute_dtype=dtype)

    def s_encoder(feats, coords, vmask):
        return enc.apply(sub("pts_middle_encoder"), feats, coords, vmask,
                         False)

    bb = SECOND3D(out_channels=cfg.backbone_channels,
                  layer_nums=cfg.backbone_layers,
                  layer_strides=cfg.backbone_strides)
    neck = SECOND3DFPN(out_channels=cfg.neck_channels,
                       upsample_strides=cfg.neck_upsample_strides)

    def s_dense(volume):
        ms = bb.apply(sub("pts_backbone"), volume.astype(dtype), False)
        return neck.apply(sub("pts_neck"), ms, False)

    def s_fps_raw(pts):
        idx = farthest_point_sample(pts, pts_mask, cfg.num_query)
        return _minmax_norm(jnp.take_along_axis(pts, idx[..., None], 1))

    def s_fps_voxel(coords, vmask):
        vc = coords[..., ::-1].astype(jnp.float32)
        vc = jnp.where(vmask[..., None], vc, 0.0)
        idx = farthest_point_sample(vc, vmask, cfg.num_query)
        return _minmax_norm(jnp.take_along_axis(vc, idx[..., None], 1))

    head = Uni3DETRHead(
        num_classes=cfg.num_classes, num_query=cfg.num_query,
        code_size=cfg.code_size, embed_dim=cfg.embed_dim,
        num_decoder_layers=cfg.num_decoder_layers,
        num_heads=cfg.num_heads, ffn_dim=cfg.ffn_dim,
        dropout=cfg.dropout, pc_range=tuple(cfg.pc_range))

    def s_head(fused, fpsb):
        return head.apply(sub("pts_bbox_head"), fused.astype(dtype), fpsb,
                          train=False, random_points=rp)

    def s_decode(outs):
        b, s, l, v = decode_predictions(outs, cfg)
        return post_process(b, s, l, v, cfg)

    # materialize stage inputs once
    feats, coords, vmask = jax.jit(s_voxelize)(points)
    volume, _grid = jax.jit(s_encoder)(feats, coords, vmask)
    fused = jax.jit(s_dense)(volume)
    f1 = jax.jit(s_fps_raw)(points)
    f2 = jax.jit(s_fps_voxel)(coords, vmask)
    fpsb = jnp.concatenate([f1, f2], axis=1)
    outs = jax.jit(s_head)(fused, fpsb)
    _ = jax.jit(s_decode)(outs)

    def timed(fn, *args, perturb):
        """Time N chained calls of jit(fn) inside one scanned program.

        A scalar HOST FETCH ends each timed region — on the axon
        remote-TPU platform ``block_until_ready`` returns without
        waiting for execution (verified: a 128 MB reduce "measured"
        6 us/iter under it; bench.py's "host fetch forces true
        completion" comment is the same finding). The 2N-minus-N
        difference cancels the constant dispatch + tunnel-fetch
        overhead (~30 ms) exactly.
        """
        import functools as _ft

        @_ft.partial(jax.jit, static_argnames=("n",))
        def run(args, n):
            def body(a, i):
                out = fn(*a)
                return perturb(a, out, i), ()
            final, _ = jax.lax.scan(body, args, jnp.arange(n))
            return jax.tree_util.tree_leaves(final)[0].astype(
                jnp.float32).ravel()[0]
        args = jax.tree_util.tree_map(jnp.asarray, args)
        float(np.asarray(run(args, N_ITERS)))
        float(np.asarray(run(args, 2 * N_ITERS)))
        t0 = time.perf_counter()
        float(np.asarray(run(args, N_ITERS)))
        t1 = time.perf_counter()
        float(np.asarray(run(args, 2 * N_ITERS)))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / N_ITERS * 1e3

    def leaf0(tree):
        return jax.tree_util.tree_leaves(tree)[0]

    results = {}
    results["voxelize"] = timed(
        s_voxelize, points,
        perturb=lambda a, out, i: (a[0] + leaf0(out).astype(jnp.float32
                                                            ).sum() * 1e-9,))
    # IMPORTANT: every argument must be data-dependently perturbed (even
    # by a provably-impossible no-op select) — a loop-invariant coords/
    # vmask lets XLA hoist the ENTIRE site machinery (rulebook matchers,
    # downsamples) out of the timed scan, undercounting it N_ITERS-fold
    # (found round 5: the e2e bench exceeded the stage sum by exactly
    # the hoisted machinery).
    def chain_int(x, out_sum):
        return jnp.where(out_sum > 1e30, x + 1, x)

    results["encoder_sparse"] = timed(
        s_encoder, feats, coords, vmask,
        perturb=lambda a, out, i: (
            (a[0] + out[0].astype(jnp.float32).sum()
             * 1e-9).astype(a[0].dtype),
            chain_int(a[1], out[0].astype(jnp.float32).sum()),
            jnp.where(out[0].astype(jnp.float32).sum() > 1e30,
                      ~a[2], a[2])))
    results["backbone_neck"] = timed(
        s_dense, volume,
        perturb=lambda a, out, i: ((a[0] + out.astype(jnp.float32).sum()
                                    * 1e-9).astype(a[0].dtype),))
    results["fps_raw"] = timed(
        s_fps_raw, points,
        perturb=lambda a, out, i: (a[0] + out.sum() * 1e-9,))
    results["fps_voxel"] = timed(
        s_fps_voxel, coords, vmask,
        # data-dependent no-op select: chains the (int) output into the
        # carry so the stage cannot be dead-code-eliminated (the old
        # discard-perturb let XLA delete the whole stage)
        perturb=lambda a, out, i: (
            jnp.where(leaf0(out).astype(jnp.float32).sum() > 1e30,
                      a[0] + 1, a[0]),
            jnp.where(leaf0(out).astype(jnp.float32).sum() > 1e30,
                      ~a[1], a[1])))
    results["head"] = timed(
        s_head, fused, fpsb,
        perturb=lambda a, out, i: (
            (a[0] + leaf0(out).astype(jnp.float32).sum() * 1e-9
             ).astype(a[0].dtype),
            a[1] + leaf0(out).astype(jnp.float32).sum() * 1e-9))
    def perturb_outs(a, out, i):
        d = out[1].astype(jnp.float32).sum() * 1e-9
        return (jax.tree_util.tree_map(
            lambda x: x + d.astype(x.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, a[0]),)

    results["decode_nms"] = timed(s_decode, outs, perturb=perturb_outs)

    # whole forward (voxelize -> ... -> decode+NMS) in ONE program under
    # the SAME harness: the honest e2e to compare against the stage sum
    # (a gap means inter-stage glue / combined-program scheduling, not a
    # stage) and against bench.py (whose extra work is the on-device
    # input generation).
    def s_full(pts):
        outs_f = model.apply(variables, pts, pts_mask, train=False,
                             random_points=rp)
        b_, s_, l_, v_ = decode_predictions(outs_f, cfg)
        return post_process(b_, s_, l_, v_, cfg)

    results["full_model"] = timed(
        s_full, points,
        perturb=lambda a, out, i: (
            a[0] + jnp.nan_to_num(out[1].astype(jnp.float32)).sum()
            * 1e-9,))

    # bench-parity scene: fresh clustered cloud generated ON DEVICE each
    # iteration (bench.py::make_xyz) + the full forward — isolates the
    # bench's input-generation cost from the model (full_model row).
    def s_scene(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(9), seed)
        K = 24
        kc, ka, kn, kq = jax.random.split(key, 4)
        centers = lo + span * (0.1 + 0.8 * jax.random.uniform(
            kc, (B, K, 3)))
        assign = jax.random.randint(ka, (B, P), 0, K)
        offs = jax.random.normal(kn, (B, P, 3)) * span * 0.02
        axis = jax.random.randint(kq, (B, K), 0, 3)
        squash = 1.0 - 0.95 * jax.nn.one_hot(axis, 3)
        pts = jnp.clip(
            jnp.take_along_axis(centers, assign[..., None], 1)
            + offs * jnp.take_along_axis(squash, assign[..., None], 1),
            lo + 1e-4, lo + span - 1e-3)
        return s_full(pts)

    results["bench_scene"] = timed(
        s_scene, jnp.int32(0),
        perturb=lambda a, out, i: (
            a[0] + 1 + (jnp.nan_to_num(out[1].astype(jnp.float32)).sum()
                        > 1e30).astype(jnp.int32),))

    costs = {
        "voxelize": stage_cost(s_voxelize, points),
        "encoder_sparse": stage_cost(s_encoder, feats, coords, vmask),
        "backbone_neck": stage_cost(s_dense, volume),
        "fps_raw": stage_cost(s_fps_raw, points),
        "fps_voxel": stage_cost(s_fps_voxel, coords, vmask),
        "head": stage_cost(s_head, fused, fpsb),
        "decode_nms": stage_cost(s_decode, outs),
    }
    peak_tflops, hbm_gbps = chip_roofs(jax.devices()[0].device_kind)
    roofline = {}
    for k, ms in results.items():
        if k not in costs:
            continue
        flops, nbytes = costs[k]
        sol_mxu = flops / (peak_tflops * 1e12) * 1e3     # ms
        sol_hbm = nbytes / (hbm_gbps * 1e9) * 1e3        # ms
        sol = max(sol_mxu, sol_hbm)
        roofline[k] = {
            "gflops": round(flops / 1e9, 2),
            "mbytes": round(nbytes / 1e6, 2),
            "sol_mxu_ms": round(sol_mxu, 3),
            "sol_hbm_ms": round(sol_hbm, 3),
            "bound": "mxu" if sol_mxu >= sol_hbm else "hbm",
            "x_over_sol": round(ms / sol, 1) if sol > 0 else None,
        }

    total = sum(v for k, v in results.items() if k in costs)
    print(json.dumps({"preset": name,
                      "chip": jax.devices()[0].device_kind,
                      "stages_ms": {k: round(v, 2)
                                    for k, v in results.items()},
                      "sum_ms": round(total, 2),
                      "roofline": roofline,
                      "roofs": {"peak_bf16_tflops": peak_tflops,
                                "hbm_gbps": hbm_gbps}}))


if __name__ == "__main__":
    main()
