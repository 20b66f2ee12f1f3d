"""Rotated / axis-aligned 3D IoU geometry, pure JAX, static shapes.

The reference delegates all of this to mmcv CUDA kernels
(``box_iou_rotated``, ``bbox_overlaps_nearest_3d``, ``bbox_overlaps_3d`` —
see mmdet3d iou3d_calculator usage at uni3detr_head.py:671,695 and
hungarian_assigner_3d.py:112). Here every op is batched jnp so XLA can fuse
it; the exact rotated-rectangle intersection is a vectorized
Sutherland–Hodgman clip over fixed 8-vertex buffers (a convex quad clipped
by 4 half-planes has at most 8 vertices).

Box layout everywhere: ``(cx, cy, cz, dx, dy, dz, yaw, ...)``.
``z_origin`` selects how the z-extent is interpreted: ``"center"`` means cz
is the z center; ``"bottom"`` means the extent is [cz, cz+dz]. The reference
feeds gravity-centered boxes into calculators that assume bottom-origin
(uni3detr_head.py:695 with coordinate='lidar'), so callers replicating that
behavior pass ``z_origin="bottom"``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .boxes import corners_bev

_NV = 8  # max vertices of rect-rect intersection


def _clip_halfplane(verts, nv, p, q, eps):
    """Clip convex polygon (verts[:nv], CCW) by half-plane left of p->q.

    ``eps`` is a scale-relative hysteresis on the inside test so edges that
    coincide with the clip line (identical/touching boxes) never register as
    crossings under float jitter.
    """
    idx = jnp.arange(_NV)
    nv_safe = jnp.maximum(nv, 1)
    nxt = (idx + 1) % nv_safe
    e = q - p
    d = e[0] * (verts[:, 1] - p[1]) - e[1] * (verts[:, 0] - p[0])
    cur_in = d >= -eps
    vnxt = verts[nxt]
    dnxt = d[nxt]
    nxt_in = dnxt >= -eps
    denom = d - dnxt
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = d / denom
    inter = verts + t[:, None] * (vnxt - verts)
    valid_edge = idx < nv
    emit0 = (cur_in != nxt_in) & valid_edge      # crossing point
    emit1 = nxt_in & valid_edge                  # next vertex kept
    cand = jnp.stack([inter, vnxt], axis=1).reshape(2 * _NV, 2)
    emit = jnp.stack([emit0, emit1], axis=1).reshape(2 * _NV)
    pos = jnp.cumsum(emit) - 1
    onehot = ((pos[:, None] == idx[None, :]) & emit[:, None])
    out = onehot.astype(verts.dtype).T @ cand
    return out, jnp.sum(emit)


def _rect_pair_intersection_area(box1_bev, box2_bev):
    """Exact intersection area of two rotated rects (5,) = (x,y,dx,dy,yaw)."""
    b1 = jnp.concatenate([box1_bev[:2], jnp.zeros((1,), box1_bev.dtype),
                          box1_bev[2:4], jnp.zeros((1,), box1_bev.dtype),
                          box1_bev[4:5]])
    b2 = jnp.concatenate([box2_bev[:2], jnp.zeros((1,), box2_bev.dtype),
                          box2_bev[2:4], jnp.zeros((1,), box2_bev.dtype),
                          box2_bev[4:5]])
    c1 = corners_bev(b1)  # (4, 2)
    c2 = corners_bev(b2)  # (4, 2)
    # hysteresis scale: cross products scale with edge_len * distance
    scale = jnp.maximum(jnp.max(box1_bev[2:4]), jnp.max(box2_bev[2:4]))
    eps = 1e-5 * jnp.maximum(scale, 1e-3) ** 2
    verts = jnp.concatenate([c1, jnp.zeros((_NV - 4, 2), c1.dtype)], axis=0)
    nv = jnp.asarray(4, jnp.int32)
    for k in range(4):
        verts, nv = _clip_halfplane(verts, nv, c2[k], c2[(k + 1) % 4], eps)
    idx = jnp.arange(_NV)
    nxt = (idx + 1) % jnp.maximum(nv, 1)
    valid = (idx < nv).astype(verts.dtype)
    x, y = verts[:, 0], verts[:, 1]
    area = 0.5 * jnp.sum((x * y[nxt] - x[nxt] * y) * valid)
    return jnp.maximum(area, 0.0)


_rect_intersection_vec = jnp.vectorize(
    _rect_pair_intersection_area, signature="(a),(a)->()")


def _bev5(boxes):
    """(..., >=7) box -> (..., 5) BEV (x, y, dx, dy, yaw)."""
    return jnp.concatenate(
        [boxes[..., 0:2], boxes[..., 3:5], boxes[..., 6:7]], axis=-1)


def _z_overlap(boxes1, boxes2, z_origin):
    if z_origin == "bottom":
        lo1, hi1 = boxes1[..., 2], boxes1[..., 2] + boxes1[..., 5]
        lo2, hi2 = boxes2[..., 2], boxes2[..., 2] + boxes2[..., 5]
    else:
        lo1 = boxes1[..., 2] - boxes1[..., 5] * 0.5
        hi1 = boxes1[..., 2] + boxes1[..., 5] * 0.5
        lo2 = boxes2[..., 2] - boxes2[..., 5] * 0.5
        hi2 = boxes2[..., 2] + boxes2[..., 5] * 0.5
    return jnp.clip(jnp.minimum(hi1, hi2) - jnp.maximum(lo1, lo2), 0.0, None)


def iou_bev_rotated(boxes1, boxes2, eps: float = 1e-6):
    """Pairwise exact rotated BEV IoU: (N, >=5) x (M, >=5) -> (N, M).

    Accepts 5-dim BEV boxes or full >=7-dim boxes.
    """
    b1 = boxes1 if boxes1.shape[-1] == 5 else _bev5(boxes1)
    b2 = boxes2 if boxes2.shape[-1] == 5 else _bev5(boxes2)
    inter = _rect_intersection_vec(b1[..., :, None, :], b2[..., None, :, :])
    a1 = (b1[..., 2] * b1[..., 3])[..., :, None]
    a2 = (b2[..., 2] * b2[..., 3])[..., None, :]
    return jnp.clip(inter / jnp.clip(a1 + a2 - inter, eps, None), 0.0, 1.0)


def iou3d_rotated(boxes1, boxes2, z_origin="center", eps: float = 1e-6):
    """Pairwise exact rotated 3D IoU: (N, 7) x (M, 7) -> (N, M).

    reference semantics: mmdet3d ``bbox_overlaps_3d`` (rotated BEV polygon
    intersection x z overlap); used at uni3detr_head.py:695,810.
    """
    inter_bev = _rect_intersection_vec(
        _bev5(boxes1)[..., :, None, :], _bev5(boxes2)[..., None, :, :])
    zo = _z_overlap(boxes1[..., :, None, :], boxes2[..., None, :, :], z_origin)
    inter = inter_bev * zo
    v1 = (boxes1[..., 3] * boxes1[..., 4] * boxes1[..., 5])[..., :, None]
    v2 = (boxes2[..., 3] * boxes2[..., 4] * boxes2[..., 5])[..., None, :]
    return jnp.clip(inter / jnp.clip(v1 + v2 - inter, eps, None), 0.0, 1.0)


def iou3d_rotated_aligned(boxes1, boxes2, z_origin="center", eps=1e-6):
    """Elementwise exact rotated 3D IoU: (..., 7) x (..., 7) -> (...)."""
    inter_bev = _rect_intersection_vec(_bev5(boxes1), _bev5(boxes2))
    zo = _z_overlap(boxes1, boxes2, z_origin)
    inter = inter_bev * zo
    v1 = boxes1[..., 3] * boxes1[..., 4] * boxes1[..., 5]
    v2 = boxes2[..., 3] * boxes2[..., 4] * boxes2[..., 5]
    return jnp.clip(inter / jnp.clip(v1 + v2 - inter, eps, None), 0.0, 1.0)


def _limit_period(val, offset=0.5, period=np.pi):
    return val - jnp.floor(val / period + offset) * period


def _nearest_bev_xyxy(boxes):
    """(..., >=7) -> axis-aligned xyxy of the nearest-axis-aligned BEV box.

    mmdet3d ``nearest_bev``: yaw limited to [-pi/2, pi/2); if |yaw| > pi/4
    swap dx/dy, then drop rotation.
    """
    rot = _limit_period(boxes[..., 6])
    cond = jnp.abs(rot) > np.pi / 4
    w = jnp.where(cond, boxes[..., 4], boxes[..., 3])
    l = jnp.where(cond, boxes[..., 3], boxes[..., 4])
    cx, cy = boxes[..., 0], boxes[..., 1]
    return jnp.stack(
        [cx - w * 0.5, cy - l * 0.5, cx + w * 0.5, cy + l * 0.5], axis=-1)


def _iou2d_xyxy(b1, b2, eps=1e-6):
    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    return inter / jnp.clip(a1 + a2 - inter, eps, None)


def nearest_bev_iou(boxes1, boxes2):
    """Pairwise 2D IoU of nearest-axis-aligned BEV boxes: (N,.)x(M,.)->(N,M).

    reference: ``bbox_overlaps_nearest_3d`` (a 2D BEV IoU despite its name),
    used by IoU3DCost (match_cost.py:94) and iou3d_loss (rdiouloss.py:99).
    """
    b1 = _nearest_bev_xyxy(boxes1)
    b2 = _nearest_bev_xyxy(boxes2)
    return _iou2d_xyxy(b1[..., :, None, :], b2[..., None, :, :])


def nearest_bev_iou_aligned(boxes1, boxes2):
    """Elementwise nearest-BEV 2D IoU: (..., 7) x (..., 7) -> (...)."""
    return _iou2d_xyxy(_nearest_bev_xyxy(boxes1), _nearest_bev_xyxy(boxes2))


def z_interval_iou_aligned(boxes1, boxes2, eps=1e-6):
    """Elementwise 1D z-IoU with center-origin extents.

    reference: uni3detr_head.py:672-673 (overlap / enclosing span).
    """
    lo1 = boxes1[..., 2] - boxes1[..., 5] * 0.5
    hi1 = boxes1[..., 2] + boxes1[..., 5] * 0.5
    lo2 = boxes2[..., 2] - boxes2[..., 5] * 0.5
    hi2 = boxes2[..., 2] + boxes2[..., 5] * 0.5
    inter = jnp.clip(jnp.minimum(hi1, hi2) - jnp.maximum(lo1, lo2), 0.0, None)
    span = jnp.maximum(hi1, hi2) - jnp.minimum(lo1, lo2)
    return inter / jnp.clip(span, eps, None)


def axis_aligned_iou3d(boxes1, boxes2, eps=1e-6):
    """Pairwise axis-aligned 3D IoU ignoring yaw: (N,7)x(M,7)->(N,M)."""
    def _minmax(b):
        lo = b[..., :3] - b[..., 3:6] * 0.5
        hi = b[..., :3] + b[..., 3:6] * 0.5
        return lo, hi
    lo1, hi1 = _minmax(boxes1[..., :, None, :])
    lo2, hi2 = _minmax(boxes2[..., None, :, :])
    whd = jnp.clip(jnp.minimum(hi1, hi2) - jnp.maximum(lo1, lo2), 0.0, None)
    inter = whd[..., 0] * whd[..., 1] * whd[..., 2]
    v1 = jnp.prod(boxes1[..., 3:6], axis=-1)[..., :, None]
    v2 = jnp.prod(boxes2[..., 3:6], axis=-1)[..., None, :]
    return inter / jnp.clip(v1 + v2 - inter, eps, None)


def rdiou(boxes1, boxes2):
    """Rotation-decoupled IoU, exactly the reference ``get_rdiou`` formula
    (core/bbox/util.py:104-154).

    boxes: (..., 7) with log-sizes at dims 3:6 and raw angle at dim 6; the
    y/z centers are scaled by 2 and rotation enters as a 4th pseudo-axis
    (t = sin(a1)cos(a2) vs cos(a1)sin(a2), unit extent) with a DIoU-style
    center penalty. Returns (u, rdiou) pair like the reference.
    """
    x1, y1, z1 = boxes1[..., 0], boxes1[..., 1] * 2, boxes1[..., 2] * 2
    l1 = jnp.clip(jnp.exp(boxes1[..., 3]), None, 10.0)
    w1 = jnp.clip(jnp.exp(boxes1[..., 4]), None, 10.0)
    h1 = jnp.clip(jnp.exp(boxes1[..., 5]), None, 10.0)
    t1 = jnp.sin(boxes1[..., 6]) * jnp.cos(boxes2[..., 6])
    x2, y2, z2 = boxes2[..., 0], boxes2[..., 1] * 2, boxes2[..., 2] * 2
    l2 = jnp.exp(boxes2[..., 3])
    w2 = jnp.exp(boxes2[..., 4])
    h2 = jnp.exp(boxes2[..., 5])
    t2 = jnp.cos(boxes1[..., 6]) * jnp.sin(boxes2[..., 6])
    j = jnp.ones_like(h2)

    vol1 = l1 * w1 * h1
    vol2 = l2 * w2 * h2

    def _inter(a1, e1, a2, e2):
        return jnp.clip(jnp.minimum(a1 + e1 / 2, a2 + e2 / 2)
                        - jnp.maximum(a1 - e1 / 2, a2 - e2 / 2), 0.0, None)

    inter = (_inter(x1, l1, x2, l2) * _inter(y1, w1, y2, w2)
             * _inter(z1, h1, z2, h2) * _inter(t1, j, t2, j))

    def _span(a1, e1, a2, e2):
        return jnp.clip(jnp.maximum(a1 + e1 / 2, a2 + e2 / 2)
                        - jnp.minimum(a1 - e1 / 2, a2 - e2 / 2), 0.0, None)

    inter_diag = ((x2 - x1) ** 2 + (y2 - y1) ** 2 + (z2 - z1) ** 2
                  + (t2 - t1) ** 2)
    c_diag = (_span(x1, l1, x2, l2) ** 2 + _span(y1, w1, y2, w2) ** 2
              + _span(z1, h1, z2, h2) ** 2 + _span(t1, j, t2, j) ** 2)
    union = vol1 + vol2 - inter
    u = inter_diag / c_diag
    return u, inter / union


# jit the public surface: these are often called eagerly (tests, host-side
# post-processing); inside larger jitted programs nested jit is inlined.
iou_bev_rotated = jax.jit(iou_bev_rotated)
iou3d_rotated = jax.jit(iou3d_rotated, static_argnames=("z_origin",))
iou3d_rotated_aligned = jax.jit(
    iou3d_rotated_aligned, static_argnames=("z_origin",))
nearest_bev_iou = jax.jit(nearest_bev_iou)
nearest_bev_iou_aligned = jax.jit(nearest_bev_iou_aligned)
z_interval_iou_aligned = jax.jit(z_interval_iou_aligned)
axis_aligned_iou3d = jax.jit(axis_aligned_iou3d)
rdiou = jax.jit(rdiou)
