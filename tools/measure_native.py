"""Measure native C++ data ops vs numpy at production pipeline scales.

Run: python tools/measure_native.py
"""
import time

import numpy as np

from uni3detr_tpu import native
from uni3detr_tpu.data import box_np_ops as ops


def timeit(fn, reps=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps * 1e3


def rand_boxes(rng, n, span=40.0):
    b = np.zeros((n, 7), np.float32)
    b[:, :2] = rng.uniform(-span, span, (n, 2))
    b[:, 2] = rng.uniform(-2, 0, n)
    b[:, 3:6] = rng.uniform(0.8, 4.0, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def numpy_pir(points, boxes):
    d = points[:, None, :2] - boxes[None, :, :2]
    c, s = np.cos(-boxes[:, 6]), np.sin(-boxes[:, 6])
    lx = d[..., 0] * c - d[..., 1] * s
    ly = d[..., 0] * s + d[..., 1] * c
    in_bev = (np.abs(lx) <= boxes[:, 3] * 0.5) \
        & (np.abs(ly) <= boxes[:, 4] * 0.5)
    in_z = (points[:, None, 2] >= boxes[:, 2]) \
        & (points[:, None, 2] <= boxes[:, 2] + boxes[:, 5])
    return in_bev & in_z


def main():
    assert native.load() is not None, "native lib failed to build"
    rng = np.random.default_rng(0)

    for tag, P, G in (("KITTI", 120_000, 40), ("nuScenes", 300_000, 40)):
        pts = rng.uniform(-40, 40, (P, 4)).astype(np.float32)
        boxes = rand_boxes(rng, G)
        t_np = timeit(lambda: numpy_pir(pts[:, :3], boxes), 3)
        t_cc = timeit(lambda: native.points_in_rbbox(pts[:, :3], boxes))
        t_any = timeit(lambda: native.points_in_any_rbbox(pts[:, :3],
                                                          boxes))
        print(f"points_in_rbbox {tag} ({P}x{G}): numpy {t_np:.1f} ms, "
              f"native {t_cc:.1f} ms ({t_np / t_cc:.1f}x), "
              f"fused-any {t_any:.1f} ms")

    # ObjectNoise end-to-end at KITTI scale (num_try=100 as configured)
    P, G, T = 120_000, 40, 100
    pts = rng.uniform(-40, 40, (P, 4)).astype(np.float32)
    boxes = rand_boxes(rng, G)
    trans = rng.standard_normal((G, T, 3)).astype(np.float32)
    rots = rng.uniform(-0.785, 0.785, (G, T)).astype(np.float32)

    def run_native():
        native.object_noise(pts.copy(), boxes.copy(), trans, rots)

    def run_numpy():
        import unittest.mock as mock
        with mock.patch.object(ops._native, "object_noise",
                               lambda *a: None):
            ops.object_noise_(pts.copy(), boxes.copy(), trans, rots)

    t_cc = timeit(run_native, 3)
    t_np = timeit(run_numpy, 1)
    print(f"object_noise KITTI ({P} pts, {G} boxes, {T} tries): "
          f"numpy {t_np:.1f} ms, native {t_cc:.1f} ms "
          f"({t_np / t_cc:.1f}x)")

    # SAT collision matrix at dbsampler scale
    a = rand_boxes(rng, 70)
    b = rand_boxes(rng, 70)
    t_np = timeit(lambda: _numpy_sat(a, b))
    t_cc = timeit(lambda: native.box_collision_test(a, b))
    print(f"box_collision 70x70: numpy {t_np:.2f} ms, native "
          f"{t_cc:.2f} ms ({t_np / t_cc:.1f}x)")


def _numpy_sat(boxes_a, boxes_b):
    ca = ops.corners_bev(boxes_a)
    cb = ops.corners_bev(boxes_b)
    overlap = np.ones((len(boxes_a), len(boxes_b)), bool)
    for k in range(2):
        ang = boxes_a[:, 6] + k * np.pi / 2
        ax = np.stack([np.cos(ang), np.sin(ang)], -1)
        pa = np.einsum("nki,ni->nk", ca, ax)
        pb = np.einsum("mki,ni->nmk", cb, ax)
        sep = (pa.max(-1)[:, None] < pb.min(-1)) \
            | (pb.max(-1) < pa.min(-1)[:, None])
        overlap &= ~sep
    for k in range(2):
        ang = boxes_b[:, 6] + k * np.pi / 2
        ax = np.stack([np.cos(ang), np.sin(ang)], -1)
        pb = np.einsum("mki,mi->mk", cb, ax)
        pa = np.einsum("nki,mi->nmk", ca, ax)
        sep = (pa.max(-1) < pb.min(-1)[None, :]) \
            | (pb.max(-1)[None, :] < pa.min(-1))
        overlap &= ~sep
    return overlap


if __name__ == "__main__":
    main()
