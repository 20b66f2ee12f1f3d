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
