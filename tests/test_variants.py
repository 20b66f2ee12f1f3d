"""Config-variant coverage: dynamic voxelization (scannet_large path),
one-to-many matching (KITTI gt_repeattimes), soft-NMS post-processing."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from uni3detr_tpu.models.detector import Uni3DETR
from uni3detr_tpu.train.step import (create_train_state, make_train_step,
                                     make_eval_step, make_optimizer)
from tiny import TINY, synth_scene, pad_batch


def _batch(seed=0, B=1):
    rng = np.random.RandomState(seed)
    pts, pmask, boxes, labels, gmask = pad_batch(
        [synth_scene(rng) for _ in range(B)])
    return {"points": jnp.asarray(pts), "pts_mask": jnp.asarray(pmask),
            "gt_boxes": jnp.asarray(boxes), "gt_labels": jnp.asarray(labels),
            "gt_mask": jnp.asarray(gmask)}


def test_dynamic_voxelization_forward():
    """scannet_large path: DynamicSimpleVFE, no per-voxel point cap
    (uni3detr.py:155-171)."""
    cfg = dataclasses.replace(TINY, dynamic_voxelization=True,
                              max_voxels=512, max_voxels_test=512)
    batch = _batch()
    model = Uni3DETR(cfg)
    rp = jnp.full((1, cfg.num_query, 3), 0.5)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           batch["points"], batch["pts_mask"], train=False,
                           random_points=rp))()
    out = model.apply(variables, batch["points"], batch["pts_mask"],
                      train=False, random_points=rp)
    assert np.isfinite(np.asarray(out["all_bbox_preds"])).all()


def test_gt_repeattimes_train_step():
    """KITTI one-to-many matching: each GT matched gt_repeattimes times
    (hungarian_assigner_3d.py:134-137)."""
    cfg = dataclasses.replace(TINY, gt_repeattimes=2)
    batch = _batch(1)
    tx = make_optimizer(1e-3)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch, tx)
    step = make_train_step(cfg, donate=False)
    state, logs = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["total_loss"]))
    # direct check of the duplicated assignment
    from uni3detr_tpu.ops.matching import match_queries_to_gt
    rng = np.random.RandomState(0)
    cost = jnp.asarray(rng.randn(cfg.num_query, 4).astype(np.float32))
    a = np.asarray(match_queries_to_gt(cost, jnp.ones(4, bool),
                                       cfg.num_query, gt_repeat=2))
    for g in range(4):
        assert (a == g).sum() == 2


def test_iou_cost_and_loss_options_train():
    """Every registered IoU match cost (match_cost.py:35-102) and loss_iou
    option (rdiouloss.py + mmdet3d RotatedIoU3DLoss) is config-selectable
    and produces finite, differentiable losses. Tested at the loss level
    (synthetic head outputs) — the full train step is covered by the
    default-option tests; compiling 3 more whole-model programs here
    would dominate suite wall-time."""
    from uni3detr_tpu.train.losses import uni3detr_loss
    from uni3detr_tpu.geom.boxes import gravity_center_boxes

    batch = _batch(3)
    rng = np.random.RandomState(5)
    L, B, Q = 2, 1, TINY.num_query
    outs = {
        "all_cls_scores": jnp.asarray(
            rng.randn(L, B, Q, TINY.num_classes).astype(np.float32)),
        "all_bbox_preds": jnp.asarray(
            rng.randn(L, B, Q, TINY.code_size).astype(np.float32) * 0.3),
        "all_iou_preds": jnp.asarray(
            rng.randn(L, B, Q).astype(np.float32)),
    }
    gt = gravity_center_boxes(batch["gt_boxes"])
    for cost_t, loss_t in (("rotated_iou3d", "rotated_iou3d"),
                           ("axis_aligned_iou3d", "rdiou"),
                           ("rdiou", "iou3d")):
        cfg = dataclasses.replace(TINY, iou_cost_type=cost_t,
                                  iou_loss_type=loss_t)

        def total(o):
            return uni3detr_loss(o, gt, batch["gt_labels"],
                                 batch["gt_mask"], cfg)[0]

        val, grads = jax.jit(jax.value_and_grad(total))(outs)
        assert np.isfinite(float(val)), (cost_t, loss_t)
        gmax = max(float(jnp.abs(g).max())
                   for g in jax.tree_util.tree_leaves(grads))
        assert np.isfinite(gmax) and gmax > 0, (cost_t, loss_t)


def test_rdiou_penalty_golden_torch():
    """rdiou_penalty == 1 - clamp(rdiou - u, -1, 1) with get_rdiou's exact
    algebra (core/bbox/util.py:104-154), oracled in torch."""
    import torch
    from uni3detr_tpu.train.losses import rdiou_penalty

    rng = np.random.RandomState(7)
    a = rng.uniform(-1, 1, (16, 7)).astype(np.float32)
    b = rng.uniform(-1, 1, (16, 7)).astype(np.float32)

    def oracle(p, t):
        p, t = torch.tensor(p), torch.tensor(t)
        x1, y1, z1 = p[..., 0], p[..., 1] * 2, p[..., 2] * 2
        l1, w1, h1 = (p[..., 3].exp().clamp(max=10), p[..., 4].exp().clamp(
            max=10), p[..., 5].exp().clamp(max=10))
        t1 = p[..., 6].sin() * t[..., 6].cos()
        x2, y2, z2 = t[..., 0], t[..., 1] * 2, t[..., 2] * 2
        l2, w2, h2 = t[..., 3].exp(), t[..., 4].exp(), t[..., 5].exp()
        t2 = p[..., 6].cos() * t[..., 6].sin()
        j = torch.ones_like(h2)
        inter = torch.ones_like(h2)
        span = torch.zeros_like(h2)
        for (a1, e1, a2, e2) in ((x1, l1, x2, l2), (y1, w1, y2, w2),
                                 (z1, h1, z2, h2), (t1, j, t2, j)):
            inter = inter * (torch.min(a1 + e1 / 2, a2 + e2 / 2)
                             - torch.max(a1 - e1 / 2, a2 - e2 / 2)).clamp(0)
            span = span + (torch.max(a1 + e1 / 2, a2 + e2 / 2)
                           - torch.min(a1 - e1 / 2, a2 - e2 / 2)) ** 2
        diag = ((x2 - x1) ** 2 + (y2 - y1) ** 2 + (z2 - z1) ** 2
                + (t2 - t1) ** 2)
        u = diag / span
        rd = inter / (l1 * w1 * h1 + l2 * w2 * h2 - inter)
        return (1 - (rd - u).clamp(-1, 1)).numpy()

    ours = np.asarray(rdiou_penalty(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, oracle(a, b), rtol=1e-5, atol=1e-5)


def test_soft_nms_eval_path():
    cfg = dataclasses.replace(TINY, post_processing="soft_nms")
    batch = _batch(2)
    tx = make_optimizer(1e-3)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch, tx)
    ev = make_eval_step(cfg)
    boxes, scores, labels, valid = ev(state.params, state.batch_stats,
                                      batch, jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(scores)).all()
    assert np.asarray(valid).any()


def test_soft_focal_cls_cost_golden_torch():
    """soft_focal cls cost == the reference SoftFocalLossCost formula
    (match_cost.py:101-128), oracled in torch; and the option trains."""
    import torch
    from uni3detr_tpu.train.losses import soft_focal_cls_cost

    rng = np.random.RandomState(11)
    Q, ncls, Gt = 12, 4, 5
    logits = rng.randn(Q, ncls).astype(np.float32)
    labels = rng.randint(0, ncls, Gt).astype(np.int32)
    iou = rng.rand(Q, Gt).astype(np.float32)

    def oracle():
        p = torch.tensor(logits).sigmoid()
        i3 = torch.tensor(iou).pow(0.001)
        pg = p[:, labels] * i3
        eps, alpha, gamma = 1e-12, 0.25, 2.0
        neg = -(1 - pg + eps).log() * (1 - alpha) * pg.pow(gamma)
        pos = -(pg + eps).log() * alpha * (1 - pg).pow(gamma)
        return (pos - neg).numpy()

    ours = np.asarray(soft_focal_cls_cost(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(iou)))
    np.testing.assert_allclose(ours, oracle(), rtol=1e-4, atol=1e-5)

    # finite loss through the option
    from uni3detr_tpu.train.losses import uni3detr_loss
    from uni3detr_tpu.geom.boxes import gravity_center_boxes
    batch = _batch(6)
    cfg = dataclasses.replace(TINY, cls_cost_type="soft_focal")
    rng2 = np.random.RandomState(12)
    L, B, Q2 = 2, 1, TINY.num_query
    outs = {
        "all_cls_scores": jnp.asarray(
            rng2.randn(L, B, Q2, TINY.num_classes).astype(np.float32)),
        "all_bbox_preds": jnp.asarray(
            rng2.randn(L, B, Q2, TINY.code_size).astype(np.float32) * 0.3),
        "all_iou_preds": jnp.asarray(rng2.randn(L, B, Q2).astype(
            np.float32)),
    }
    gt = gravity_center_boxes(batch["gt_boxes"])
    total = jax.jit(lambda o: uni3detr_loss(
        o, gt, batch["gt_labels"], batch["gt_mask"], cfg)[0])(outs)
    assert np.isfinite(float(total))
