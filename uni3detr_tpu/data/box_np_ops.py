"""Host-side numpy box utilities for the data pipeline.

Equivalent role to mmdet3d's box_np_ops (used by the reference dbsampler
at dbsampler.py:246-258 and GT-database creation) — data-prep stays on
host, so plain numpy. Boxes are storage layout (cx, cy, cz_bottom, dx, dy,
dz, yaw[, vx, vy]).
"""
from __future__ import annotations

import numpy as np


def rotation_2d(yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2)


def corners_bev(boxes):
    """(N, >=7) -> (N, 4, 2) CCW BEV corners."""
    n = boxes.shape[0]
    half = boxes[:, 3:5] * 0.5
    corners = np.stack([
        np.stack([half[:, 0], half[:, 1]], -1),
        np.stack([-half[:, 0], half[:, 1]], -1),
        np.stack([-half[:, 0], -half[:, 1]], -1),
        np.stack([half[:, 0], -half[:, 1]], -1),
    ], 1)  # (N, 4, 2)
    rot = rotation_2d(boxes[:, 6])  # (N, 2, 2)
    return np.einsum("nij,nkj->nki", rot, corners) + boxes[:, None, :2]


def corners_3d(boxes):
    """(N, >=7) storage boxes -> (N, 8, 3) corners: the 4 BEV corners at
    z_bottom then at z_bottom + dz."""
    bev = corners_bev(boxes)  # (N, 4, 2)
    z0 = boxes[:, 2:3]
    z1 = z0 + boxes[:, 5:6]
    lo = np.concatenate([bev, np.broadcast_to(z0[:, None],
                                              bev.shape[:2] + (1,))], -1)
    hi = np.concatenate([bev, np.broadcast_to(z1[:, None],
                                              bev.shape[:2] + (1,))], -1)
    return np.concatenate([lo, hi], 1)


def points_in_rbbox(points, boxes, z_origin="bottom"):
    """(P, >=3) x (N, 7) -> (P, N) bool membership mask."""
    if len(boxes) == 0 or len(points) == 0:
        return np.zeros((len(points), len(boxes)), bool)
    d = points[:, None, :2] - boxes[None, :, :2]  # (P, N, 2)
    c, s = np.cos(-boxes[:, 6]), np.sin(-boxes[:, 6])
    lx = d[..., 0] * c - d[..., 1] * s
    ly = d[..., 0] * s + d[..., 1] * c
    in_bev = (np.abs(lx) <= boxes[:, 3] * 0.5) \
        & (np.abs(ly) <= boxes[:, 4] * 0.5)
    z0 = boxes[:, 2] if z_origin == "bottom" else boxes[:, 2] - boxes[:, 5] / 2
    in_z = (points[:, None, 2] >= z0) & (points[:, None, 2] <= z0
                                         + boxes[:, 5])
    return in_bev & in_z


def _project(poly, axis):
    p = poly @ axis
    return p.min(-1), p.max(-1)


def box_collision_test(boxes_a, boxes_b):
    """BEV rotated-rectangle overlap via SAT: (Na, 7) x (Nb, 7) ->
    (Na, Nb) bool (True = overlapping)."""
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)), bool)
    ca = corners_bev(boxes_a)  # (Na, 4, 2)
    cb = corners_bev(boxes_b)
    overlap = np.ones((len(boxes_a), len(boxes_b)), bool)
    # each rect contributes 2 unique separating-axis candidates
    for k in range(2):
        ang = boxes_a[:, 6] + k * np.pi / 2
        ax = np.stack([np.cos(ang), np.sin(ang)], -1)      # (Na, 2)
        pa = np.einsum("nki,ni->nk", ca, ax)               # (Na, 4)
        pb = np.einsum("mki,ni->nmk", cb, ax)              # (Na, Nb, 4)
        sep = (pa.max(-1)[:, None] < pb.min(-1)) \
            | (pb.max(-1) < pa.min(-1)[:, None])
        overlap &= ~sep
    for k in range(2):
        ang = boxes_b[:, 6] + k * np.pi / 2
        ax = np.stack([np.cos(ang), np.sin(ang)], -1)      # (Nb, 2)
        pb = np.einsum("mki,mi->mk", cb, ax)               # (Nb, 4)
        pa = np.einsum("nki,mi->nmk", ca, ax)              # (Na, Nb, 4)
        sep = (pa.max(-1) < pb.min(-1)[None, :]) \
            | (pb.max(-1)[None, :] < pa.min(-1))
        overlap &= ~sep
    return overlap


def limit_period(val, offset=0.5, period=np.pi * 2):
    return val - np.floor(val / period + offset) * period
