"""Golden tests for the geometry library against numpy oracles.

Rotated-rectangle intersection is checked against a dense Monte-Carlo
rasterization oracle (no shapely in this environment) plus exact
hand-computed cases.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from uni3detr_tpu.geom import (
    encode_boxes, decode_boxes, gravity_center_boxes, bottom_center_boxes,
    iou_bev_rotated, iou3d_rotated, iou3d_rotated_aligned,
    nearest_bev_iou, nearest_bev_iou_aligned, axis_aligned_iou3d,
    z_interval_iou_aligned, rdiou,
)
from uni3detr_tpu.geom.boxes import corners_bev, inverse_sigmoid


def _mc_rect_iou(b1, b2, n=700):
    """Monte-Carlo BEV IoU oracle for (x, y, dx, dy, yaw) boxes."""
    def inside(pts, b):
        x, y, dx, dy, yaw = b
        c, s = np.cos(-yaw), np.sin(-yaw)
        px = (pts[:, 0] - x) * c - (pts[:, 1] - y) * s
        py = (pts[:, 0] - x) * s + (pts[:, 1] - y) * c
        return (np.abs(px) <= dx / 2) & (np.abs(py) <= dy / 2)
    lo = np.minimum(np.array(b1[:2]) - 2 * max(b1[2:4]),
                    np.array(b2[:2]) - 2 * max(b2[2:4]))
    hi = np.maximum(np.array(b1[:2]) + 2 * max(b1[2:4]),
                    np.array(b2[:2]) + 2 * max(b2[2:4]))
    gx, gy = np.meshgrid(np.linspace(lo[0], hi[0], n),
                         np.linspace(lo[1], hi[1], n))
    pts = np.stack([gx.ravel(), gy.ravel()], -1)
    m1, m2 = inside(pts, b1), inside(pts, b2)
    inter = (m1 & m2).sum()
    union = (m1 | m2).sum()
    return inter / max(union, 1)


def test_code_roundtrip():
    rng = np.random.RandomState(0)
    boxes = np.concatenate([
        rng.uniform(-3, 3, (32, 3)),
        rng.uniform(0.2, 3.0, (32, 3)),
        rng.uniform(-np.pi, np.pi, (32, 1)),
    ], -1).astype(np.float32)
    code = encode_boxes(jnp.asarray(boxes))
    assert code.shape == (32, 8)
    back = np.asarray(decode_boxes(code))
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], rtol=1e-4, atol=1e-4)
    # yaw recovered modulo 2*pi
    dyaw = (back[:, 6] - boxes[:, 6] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dyaw, 0, atol=1e-4)


def test_code_roundtrip_velocity():
    rng = np.random.RandomState(1)
    boxes = np.concatenate([
        rng.uniform(-3, 3, (8, 3)),
        rng.uniform(0.2, 3.0, (8, 3)),
        rng.uniform(-np.pi, np.pi, (8, 1)),
        rng.uniform(-2, 2, (8, 2)),
    ], -1).astype(np.float32)
    code = encode_boxes(jnp.asarray(boxes))
    assert code.shape == (8, 10)
    back = np.asarray(decode_boxes(code))
    np.testing.assert_allclose(back[:, 7:9], boxes[:, 7:9], atol=1e-5)


def test_gravity_bottom_roundtrip():
    rng = np.random.RandomState(2)
    b = rng.uniform(0.5, 2.0, (5, 7)).astype(np.float32)
    g = gravity_center_boxes(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(g)[:, 2], b[:, 2] + b[:, 5] / 2,
                               rtol=1e-6)
    back = np.asarray(bottom_center_boxes(g))
    np.testing.assert_allclose(back, b, rtol=1e-6)


def test_corners_bev_axis_aligned():
    box = jnp.asarray([[1.0, 2.0, 0.0, 2.0, 4.0, 1.0, 0.0]])
    c = np.asarray(corners_bev(box))[0]
    expect = {(2.0, 4.0), (0.0, 4.0), (0.0, 0.0), (2.0, 0.0)}
    got = {tuple(np.round(p, 5)) for p in c}
    assert got == expect


def test_rotated_bev_iou_exact_cases():
    # identical boxes -> IoU 1
    b = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 1.0, 1.0, 0.3]])
    iou = np.asarray(iou_bev_rotated(b, b))
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-5)
    # disjoint -> 0
    b2 = jnp.asarray([[10.0, 10.0, 0.0, 2.0, 1.0, 1.0, 1.0]])
    np.testing.assert_allclose(np.asarray(iou_bev_rotated(b, b2)), [[0.0]],
                               atol=1e-7)
    # half overlap, axis aligned: 1x1 squares offset by 0.5 -> inter .5 union 1.5
    a = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]])
    c = jnp.asarray([[0.5, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(iou_bev_rotated(a, c)),
                               [[0.5 / 1.5]], atol=1e-6)
    # unit square vs itself rotated 45deg: inter = 2*(sqrt(2)-1)
    d = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, np.pi / 4]])
    inter = 2 * (np.sqrt(2) - 1)
    np.testing.assert_allclose(np.asarray(iou_bev_rotated(a, d)),
                               [[inter / (2 - inter)]], atol=5e-4)


def test_rotated_bev_iou_monte_carlo():
    rng = np.random.RandomState(3)
    boxes1, boxes2 = [], []
    for _ in range(12):
        boxes1.append([rng.uniform(-1, 1), rng.uniform(-1, 1), 0.0,
                       rng.uniform(0.5, 2), rng.uniform(0.5, 2), 1.0,
                       rng.uniform(-np.pi, np.pi)])
        boxes2.append([rng.uniform(-1, 1), rng.uniform(-1, 1), 0.0,
                       rng.uniform(0.5, 2), rng.uniform(0.5, 2), 1.0,
                       rng.uniform(-np.pi, np.pi)])
    b1 = jnp.asarray(boxes1, jnp.float32)
    b2 = jnp.asarray(boxes2, jnp.float32)
    iou = np.diag(np.asarray(iou_bev_rotated(b1, b2)))
    for i in range(12):
        bev1 = [boxes1[i][0], boxes1[i][1], boxes1[i][3], boxes1[i][4],
                boxes1[i][6]]
        bev2 = [boxes2[i][0], boxes2[i][1], boxes2[i][3], boxes2[i][4],
                boxes2[i][6]]
        oracle = _mc_rect_iou(bev1, bev2)
        assert abs(iou[i] - oracle) < 2.5e-2, (i, iou[i], oracle)


def test_iou3d_rotated_matches_bev_times_z():
    b1 = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    b2 = jnp.asarray([[0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 0.0]])
    # center origin: z overlap 1 of spans 2,2 -> inter 4, union 16-4
    np.testing.assert_allclose(np.asarray(iou3d_rotated(b1, b2)),
                               [[4.0 / 12.0]], atol=1e-6)
    # bottom origin same here (equal heights shift equally)
    np.testing.assert_allclose(
        np.asarray(iou3d_rotated(b1, b2, z_origin="bottom")),
        [[4.0 / 12.0]], atol=1e-6)
    al = np.asarray(iou3d_rotated_aligned(b1[0], b2[0]))
    np.testing.assert_allclose(al, 4.0 / 12.0, atol=1e-6)


def test_nearest_bev_iou():
    # yaw ~ pi/2 swaps extents
    b1 = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 1.0, 1.0, 0.0]])
    b2 = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 2.0, 1.0, np.pi / 2]])
    iou = np.asarray(nearest_bev_iou(b1, b2))
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(nearest_bev_iou_aligned(b1, b2)), [1.0], atol=1e-5)


def test_z_interval_iou():
    b1 = jnp.asarray([[0, 0, 0.0, 1, 1, 2.0, 0]], jnp.float32)
    b2 = jnp.asarray([[0, 0, 1.0, 1, 1, 2.0, 0]], jnp.float32)
    # spans [-1,1] and [0,2]: inter 1, enclosing 3
    np.testing.assert_allclose(np.asarray(z_interval_iou_aligned(b1, b2)),
                               [1 / 3], atol=1e-6)


def test_axis_aligned_iou3d():
    b1 = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.7]], jnp.float32)
    np.testing.assert_allclose(np.asarray(axis_aligned_iou3d(b1, b1)),
                               [[1.0]], atol=1e-6)


def test_rdiou_identical():
    rng = np.random.RandomState(4)
    b = np.concatenate([
        rng.uniform(-1, 1, (6, 3)),
        rng.uniform(-0.5, 0.5, (6, 3)),  # log sizes
        rng.uniform(-np.pi, np.pi, (6, 1)),
    ], -1).astype(np.float32)
    u, rd = rdiou(jnp.asarray(b), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(rd), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(u), 0.0, atol=1e-6)


def test_inverse_sigmoid_roundtrip():
    x = jnp.asarray([0.01, 0.3, 0.5, 0.99])
    import jax
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(inverse_sigmoid(x))),
                               np.asarray(x), atol=1e-4)
