"""Native (C++) host data ops vs the numpy reference implementations.

The numpy bodies in data/box_np_ops.py are the semantic reference
(mirroring mmdet3d box_np_ops / noise_per_object_v3_ semantics); the
native module must agree exactly away from geometric boundary cases.
"""
import numpy as np
import pytest

from uni3detr_tpu import native
from uni3detr_tpu.data import box_np_ops as ops


def _numpy_points_in_rbbox(points, boxes, z_origin="bottom"):
    d = points[:, None, :2] - boxes[None, :, :2]
    c, s = np.cos(-boxes[:, 6]), np.sin(-boxes[:, 6])
    lx = d[..., 0] * c - d[..., 1] * s
    ly = d[..., 0] * s + d[..., 1] * c
    in_bev = (np.abs(lx) <= boxes[:, 3] * 0.5) \
        & (np.abs(ly) <= boxes[:, 4] * 0.5)
    z0 = boxes[:, 2] if z_origin == "bottom" else boxes[:, 2] \
        - boxes[:, 5] / 2
    in_z = (points[:, None, 2] >= z0) \
        & (points[:, None, 2] <= z0 + boxes[:, 5])
    return in_bev & in_z


def _rand_boxes(rng, n, span=20.0):
    b = np.zeros((n, 7), np.float32)
    b[:, :2] = rng.uniform(-span, span, (n, 2))
    b[:, 2] = rng.uniform(-2, 0, n)
    b[:, 3:6] = rng.uniform(0.5, 4.0, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native lib unavailable (g++ missing?)")
    return lib


def test_points_in_rbbox_matches_numpy(lib):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-22, 22, (5000, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3, 3, 5000)
    boxes = _rand_boxes(rng, 37)
    for z_origin in ("bottom", "center"):
        want = _numpy_points_in_rbbox(pts[:, :3], boxes, z_origin)
        got = native.points_in_rbbox(pts[:, :3], boxes, z_origin)
        # fp32 trig rounding can flip exact-boundary points; none are
        # expected from continuous random draws
        assert (got == want).mean() == 1.0


def test_points_in_any_rbbox(lib):
    rng = np.random.default_rng(1)
    pts = rng.uniform(-22, 22, (3000, 3)).astype(np.float32)
    boxes = _rand_boxes(rng, 20)
    want = _numpy_points_in_rbbox(pts, boxes).any(-1)
    got = ops.points_in_any_rbbox(pts, boxes)
    assert (got == want).all()


def test_box_collision_matches_numpy(lib):
    rng = np.random.default_rng(2)
    a = _rand_boxes(rng, 60)
    b = _rand_boxes(rng, 45)
    got = native.box_collision_test(a, b)

    # inline the numpy SAT (box_np_ops dispatches to native now)
    ca, cb = ops.corners_bev(a), ops.corners_bev(b)
    overlap = np.ones((len(a), len(b)), bool)
    for boxes, cc, other_c, transpose in ((a, ca, cb, False),
                                          (b, cb, ca, True)):
        for k in range(2):
            ang = boxes[:, 6] + k * np.pi / 2
            ax = np.stack([np.cos(ang), np.sin(ang)], -1)
            p_self = np.einsum("nki,ni->nk", cc, ax)
            p_oth = np.einsum("mki,ni->nmk", other_c, ax)
            sep = (p_self.max(-1)[:, None] < p_oth.min(-1)) \
                | (p_oth.max(-1) < p_self.min(-1)[:, None])
            overlap &= ~(sep.T if transpose else sep)
    assert (got == overlap).mean() > 0.999  # allow fp boundary flips
    # self-collision sanity: every box overlaps itself
    assert native.box_collision_test(a, a).diagonal().all()


def test_object_noise_native_matches_numpy(lib):
    rng = np.random.default_rng(3)
    pts0 = rng.uniform(-20, 20, (4000, 4)).astype(np.float32)
    boxes0 = _rand_boxes(rng, 15)
    # put some points inside boxes so the rigid move is exercised
    for i in range(len(boxes0)):
        pts0[i * 100:(i + 1) * 100, :3] = boxes0[i, :3] \
            + rng.uniform(-0.2, 0.2, (100, 3)).astype(np.float32)
        pts0[i * 100:(i + 1) * 100, 2] += boxes0[i, 5] / 2
    trans = rng.standard_normal((15, 20, 3)).astype(np.float32) * 0.8
    rots = rng.uniform(-0.6, 0.6, (15, 20)).astype(np.float32)

    p_nat = pts0.copy()
    b_nat = boxes0.copy()
    acc_nat = native.object_noise(p_nat, b_nat, trans, rots)

    p_ref = pts0.copy()
    b_ref = boxes0.copy()
    # numpy reference body (force the fallback)
    import unittest.mock as mock
    with mock.patch.object(ops._native, "object_noise",
                           lambda *a: None):
        acc_ref = ops.object_noise_(p_ref, b_ref, trans, rots)

    np.testing.assert_array_equal(acc_nat, acc_ref)
    np.testing.assert_allclose(b_nat, b_ref, atol=1e-5)
    np.testing.assert_allclose(p_nat, p_ref, atol=1e-4)
    assert (acc_nat >= 0).any()  # at least one perturbation accepted


def test_object_noise_empty_and_no_accept(lib):
    pts = np.zeros((10, 4), np.float32)
    boxes = np.zeros((0, 7), np.float32)
    acc = ops.object_noise_(pts, boxes, np.zeros((0, 5, 3), np.float32),
                            np.zeros((0, 5), np.float32))
    assert acc.shape == (0,)
    # two coincident boxes: any perturbation that keeps them overlapping
    # is rejected; huge translations escape, so force tiny ones
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0],
                      [0, 0, 0, 2, 2, 2, 0]], np.float32)
    trans = np.zeros((2, 4, 3), np.float32)
    rots = np.zeros((2, 4), np.float32)
    pts = np.zeros((5, 4), np.float32)
    acc = ops.object_noise_(pts, boxes, trans, rots)
    assert (acc == -1).all()


def test_pipeline_object_noise_still_works(lib):
    from uni3detr_tpu.data.pipeline import TRANSFORMS
    rng = np.random.default_rng(0)
    tr = TRANSFORMS["ObjectNoise"]({}, num_try=10)
    boxes = _rand_boxes(rng, 6)
    sample = {
        "points": rng.uniform(-20, 20, (500, 4)).astype(np.float32),
        "gt_boxes": boxes.copy(),
        "gt_labels": np.zeros(6, np.int64),
    }
    out = tr(sample, rng)
    assert out["gt_boxes"].shape == (6, 7)
    assert out["points"].shape == (500, 4)
    assert np.isfinite(out["points"]).all()
    # sizes never change under ObjectNoise
    np.testing.assert_allclose(out["gt_boxes"][:, 3:6], boxes[:, 3:6])


def test_native_threaded_consistency(lib):
    """The loader thread-pool calls native ops concurrently; results must
    match single-threaded output (the C calls share no mutable state)."""
    from concurrent.futures import ThreadPoolExecutor
    rng = np.random.default_rng(7)
    pts = rng.uniform(-20, 20, (20000, 3)).astype(np.float32)
    jobs = [_rand_boxes(np.random.default_rng(100 + i), 25)
            for i in range(8)]
    want = [native.points_in_rbbox(pts, b) for b in jobs]
    with ThreadPoolExecutor(max_workers=4) as ex:
        got = list(ex.map(lambda b: native.points_in_rbbox(pts, b), jobs))
    for w, g in zip(want, got):
        assert (w == g).all()


def test_native_heap_path_many_boxes(lib):
    """>512 boxes exercises the heap-allocated per-box table in the C++
    points_in_rbbox (kMaxStack boundary)."""
    rng = np.random.default_rng(9)
    pts = rng.uniform(-50, 50, (1000, 3)).astype(np.float32)
    boxes = _rand_boxes(rng, 600, span=50)
    got = native.points_in_rbbox(pts, boxes)
    want = _numpy_points_in_rbbox(pts, boxes)
    assert (got == want).all()


def test_object_noise_preserves_extra_box_dims(lib):
    """9-dim (velocity) boxes: only center/yaw change, cols 7+ intact."""
    rng = np.random.default_rng(10)
    pts = np.ascontiguousarray(
        rng.uniform(-5, 5, (100, 4)).astype(np.float32))
    boxes = np.zeros((2, 9), np.float32)
    boxes[:, :2] = [[0, 0], [5, 5]]
    boxes[:, 3:6] = 1.0
    boxes[:, 7:] = 7.0
    trans = np.full((2, 3, 3), 0.1, np.float32)
    rots = np.zeros((2, 3), np.float32)
    acc = ops.object_noise_(pts, boxes, trans, rots)
    assert (acc >= 0).all()
    assert (boxes[:, 7:] == 7.0).all()
    np.testing.assert_allclose(boxes[:, :2], [[0.1, 0.1], [5.1, 5.1]],
                               atol=1e-6)
