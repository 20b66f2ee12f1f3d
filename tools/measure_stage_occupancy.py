"""Measure ACTUAL per-stage sparse-site counts vs the encoder's static
budgets, on the bench input distributions (clustered surface-like +
uniform), for the outdoor presets.

The encoder pads every stage's site list to a static budget
(``SparseEncoderHD.budget_shrink`` x input V). The reference (spconv)
materializes exact site sets, so any budget above the true occupancy is
pure padding cost: at nuScenes eval budgets stages 1-2 run at V=120k
while a real scan's stride-2 site set is several times smaller. This
tool prints, per preset/distribution, the max over N scenes of the
distinct-site count after each downsample, as a fraction of the input
budget — the data that justifies per-preset ``encoder_budget_shrink``.

Host-side numpy only (exact coverage semantics of ``downsample_sites``:
output o covers inputs s*o - p + [0, k-1]).

Run: ``python tools/measure_stage_occupancy.py [n_scenes]``.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from uni3detr_tpu.presets import PRESETS


def make_xyz(rng, P, lo, span, distribution):
    if distribution == "uniform":
        return lo + span * rng.uniform(size=(P, 3))
    K = 24
    centers = lo + span * (0.1 + 0.8 * rng.uniform(size=(K, 3)))
    assign = rng.randint(0, K, size=P)
    offs = rng.randn(P, 3) * span * 0.02
    axis = rng.randint(0, 3, size=K)
    squash = 1.0 - 0.95 * np.eye(3)[axis]      # (K, 3)
    xyz = centers[assign] + offs * squash[assign]
    return np.clip(xyz, lo + 1e-4, lo + span - 1e-3)


def downsample_ids(coords, grid, padding, stride=2, kernel=3):
    """Exact any-covered-output site set (downsample_sites semantics)."""
    out_grid = tuple((g + 2 * p - kernel) // stride + 1
                     for g, p in zip(grid, padding))
    outs = []
    for ax in range(3):
        i = coords[:, ax]
        p = padding[ax]
        hi = (i + p) // stride
        lo = np.maximum((i + p - kernel + stride) // stride, 0)
        lo = np.minimum(lo, hi)
        c = np.stack([lo, hi], -1)
        ok = (c >= 0) & (c < out_grid[ax])
        outs.append((c, ok))
    (cz, okz), (cy, oky), (cx, okx) = outs
    Do, Ho, Wo = out_grid
    lin = ((cz[:, :, None, None] * Ho + cy[:, None, :, None]) * Wo
           + cx[:, None, None, :])
    ok = okz[:, :, None, None] & oky[:, None, :, None] & okx[:, None, None, :]
    ids = np.unique(lin[ok])
    D, H, W = out_grid
    c = np.stack([ids // (H * W), (ids // W) % H, ids % W], -1)
    return c, out_grid


def main(n_scenes=8):
    pads = ((1, 1, 1), (1, 1, 1), (0, 1, 1))
    for preset in ("uni3detr_nuscenes", "uni3detr_kitti_car",
                   "uni3detr_sunrgbd", "uni3detr_scannet"):
        cfg = PRESETS[preset]
        P = cfg.num_points
        Vbudget = cfg.max_voxels_test
        lo = np.array(cfg.pc_range[:3])
        span = np.array(cfg.pc_range[3:]) - lo
        grid0 = tuple(cfg.grid_size)
        vs = np.array(cfg.voxel_size)
        for distribution in ("clustered", "uniform"):
            worst = [0, 0, 0, 0]
            for s in range(n_scenes):
                rng = np.random.RandomState(100 + s)
                xyz = make_xyz(rng, P, lo, span, distribution)
                # voxel coords (z, y, x); grid is (D, H, W)
                cxyz = ((xyz - lo) / vs).astype(np.int64)
                cxyz = np.minimum(cxyz, np.array(grid0)[::-1] - 1)
                c = cxyz[:, ::-1]
                D, H, W = grid0
                ids = np.unique((c[:, 0] * H + c[:, 1]) * W + c[:, 2])
                if len(ids) > Vbudget:     # hard-voxelize cap
                    ids = ids[:Vbudget]
                c = np.stack([ids // (H * W), (ids // W) % H, ids % W], -1)
                worst[0] = max(worst[0], len(ids))
                grid = grid0
                for st in range(3):
                    c, grid = downsample_ids(c, grid, pads[st])
                    worst[st + 1] = max(worst[st + 1], len(c))
            fr = [w / Vbudget for w in worst]
            print(f"{preset:24s} {distribution:9s} V_budget={Vbudget:7d} "
                  f"actual V={worst[0]:7d}  stages="
                  + " ".join(f"{w:7d}({f:.3f})" for w, f in
                             zip(worst[1:], fr[1:])))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
