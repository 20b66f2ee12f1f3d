"""3D box representations and normalized regression codes.

Conventions (chosen once for the whole framework):

- *Storage box* (datasets, eval, final outputs):
  ``(cx, cy, cz_bottom, dx, dy, dz, yaw[, vx, vy])`` — z is the *bottom* face
  center, matching the mmdet3d >= 1.0 box convention used by the reference
  datasets.
- *Model box* (everything between Hungarian matching and final decode):
  gravity-centered ``(cx, cy, cz, dx, dy, dz, yaw[, vx, vy])``.
  (reference: uni3detr_head.py:759-761 converts GT to gravity center before
  the loss; :842 shifts z back by dz/2 on output.)
- *Normalized code* (8- or 10-dim regression target):
  ``(cx, cy, log dx, log dy, cz, log dz, sin r', cos r'[, vx, vy])`` with
  ``r' = -yaw - pi/2`` — exactly the reference ``normalize_bbox`` semantics
  for mmdet3d >= 1.0 (core/bbox/util.py:8-42); ``decode_boxes`` inverts it
  (util.py:44-80).

All functions are shape-polymorphic over leading batch dims and pure jnp.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x, eps: float = 1e-5):
    """Numerically-safe logit, matching mmdet's ``inverse_sigmoid``."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def gravity_center_boxes(boxes):
    """Storage box (bottom-z) -> model box (gravity-center z)."""
    z = boxes[..., 2:3] + boxes[..., 5:6] * 0.5
    return jnp.concatenate([boxes[..., :2], z, boxes[..., 3:]], axis=-1)


def bottom_center_boxes(boxes):
    """Model box (gravity-center z) -> storage box (bottom-z)."""
    z = boxes[..., 2:3] - boxes[..., 5:6] * 0.5
    return jnp.concatenate([boxes[..., :2], z, boxes[..., 3:]], axis=-1)


def encode_boxes(boxes):
    """Gravity-centered boxes (..., 7|9) -> normalized code (..., 8|10).

    Matches reference normalize_bbox (core/bbox/util.py:8-42, >=1.0 branch):
    log sizes with 1e-5 eps, rotation stored as (sin r', cos r') with
    r' = -yaw - pi/2.
    """
    cx, cy, cz = boxes[..., 0:1], boxes[..., 1:2], boxes[..., 2:3]
    dx = jnp.log(boxes[..., 3:4] + 1e-5)
    dy = jnp.log(boxes[..., 4:5] + 1e-5)
    dz = jnp.log(boxes[..., 5:6] + 1e-5)
    rot = -boxes[..., 6:7] - np.pi / 2
    out = [cx, cy, dx, dy, cz, dz, jnp.sin(rot), jnp.cos(rot)]
    if boxes.shape[-1] > 7:
        out.append(boxes[..., 7:9])
    return jnp.concatenate(out, axis=-1)


def decode_boxes(code):
    """Normalized code (..., 8|10) -> gravity-centered boxes (..., 7|9).

    Matches reference denormalize_bbox (core/bbox/util.py:44-80).
    """
    rot = jnp.arctan2(code[..., 6:7], code[..., 7:8])
    yaw = -rot - np.pi / 2
    cx, cy, cz = code[..., 0:1], code[..., 1:2], code[..., 4:5]
    dx = jnp.exp(code[..., 2:3])
    dy = jnp.exp(code[..., 3:4])
    dz = jnp.exp(code[..., 5:6])
    out = [cx, cy, cz, dx, dy, dz, yaw]
    if code.shape[-1] > 8:
        out.append(code[..., 8:10])
    return jnp.concatenate(out, axis=-1)


def corners_bev(boxes):
    """BEV corners of (..., >=7) boxes -> (..., 4, 2), counter-clockwise.

    Corner order: starting at (+dx/2, +dy/2) in the box frame, CCW for
    positive yaw rotation convention x->y.
    """
    cx, cy = boxes[..., 0], boxes[..., 1]
    hx, hy = boxes[..., 3] * 0.5, boxes[..., 4] * 0.5
    yaw = boxes[..., 6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    # box-frame corner offsets, CCW
    ox = jnp.stack([hx, -hx, -hx, hx], axis=-1)
    oy = jnp.stack([hy, hy, -hy, -hy], axis=-1)
    x = cx[..., None] + ox * c[..., None] - oy * s[..., None]
    y = cy[..., None] + ox * s[..., None] + oy * c[..., None]
    return jnp.stack([x, y], axis=-1)


def corners_3d(boxes):
    """8 corners of (..., >=7) gravity-centered boxes -> (..., 8, 3).

    Bottom 4 corners first (same BEV order as ``corners_bev``), then top 4.
    """
    bev = corners_bev(boxes)  # (..., 4, 2)
    z0 = boxes[..., 2] - boxes[..., 5] * 0.5
    z1 = boxes[..., 2] + boxes[..., 5] * 0.5
    zb = jnp.broadcast_to(z0[..., None, None], bev.shape[:-1] + (1,))
    zt = jnp.broadcast_to(z1[..., None, None], bev.shape[:-1] + (1,))
    bot = jnp.concatenate([bev, zb], axis=-1)
    top = jnp.concatenate([bev, zt], axis=-1)
    return jnp.concatenate([bot, top], axis=-2)


def shift_scale_points(xyz, src_min, src_max):
    """Min-max normalize points to [0, 1] per batch element.

    reference: uni3detr.py:18-46 (shift_scale_points with default dst range).
    xyz: (B, N, 3); src_min/src_max: (B, 3).
    """
    diff = src_max[:, None, :] - src_min[:, None, :]
    return (xyz - src_min[:, None, :]) / diff
