"""Training-path tests: loss sanity, overfit on a fixed synthetic scene,
eval decode."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from uni3detr_tpu.train.step import (
    create_train_state, make_train_step, make_eval_step, make_optimizer,
    step_lr_schedule,
)
from uni3detr_tpu.train.losses import soft_focal_loss, focal_cls_cost
from uni3detr_tpu.geom.iou import iou3d_rotated
from tiny import TINY, synth_scene, pad_batch


def _batch(seed=0, B=2):
    rng = np.random.RandomState(seed)
    pts, pmask, boxes, labels, gmask = pad_batch(
        [synth_scene(rng) for _ in range(B)])
    return {"points": jnp.asarray(pts), "pts_mask": jnp.asarray(pmask),
            "gt_boxes": jnp.asarray(boxes), "gt_labels": jnp.asarray(labels),
            "gt_mask": jnp.asarray(gmask)}


def test_soft_focal_loss_basics():
    logits = jnp.asarray([[5.0, -5.0], [-5.0, 5.0]])
    labels = jnp.asarray([0, 2])  # second is background (ncls=2)
    quality = jnp.asarray([1.0, 1.0])
    loss = np.asarray(soft_focal_loss(logits, labels, quality, 2))
    # confident correct prediction -> tiny loss; background with one
    # confident positive logit -> big loss
    assert loss[0] < 0.1
    assert loss[1] > 0.5


def test_focal_cost_prefers_right_class():
    logits = jnp.asarray([[4.0, -4.0], [-4.0, 4.0]])
    cost = np.asarray(focal_cls_cost(logits, jnp.asarray([0, 1])))
    assert cost[0, 0] < cost[0, 1]
    assert cost[1, 1] < cost[1, 0]


def test_train_step_runs_and_loss_finite():
    batch = _batch()
    tx = make_optimizer(1e-3)
    state = create_train_state(TINY, jax.random.PRNGKey(0), batch, tx)
    step = make_train_step(TINY, donate=False)
    state, logs = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["total_loss"]))
    for k in ("loss_cls", "loss_bbox", "loss_iou", "loss_iou_pred"):
        assert np.isfinite(float(logs[k])), k
    assert int(state.step) == 1


@pytest.mark.slow
def test_overfit_single_scene():
    """End-to-end: loss decreases markedly when overfitting one batch."""
    batch = _batch(3, B=1)
    tx = make_optimizer(step_lr_schedule(2e-3, 1000, [100]))
    state = create_train_state(TINY, jax.random.PRNGKey(0), batch, tx)
    step = make_train_step(TINY)
    first = None
    rng = jax.random.PRNGKey(7)
    for i in range(60):
        rng, k = jax.random.split(rng)
        state, logs = step(state, batch, k)
        if first is None:
            first = float(logs["total_loss"])
    last = float(logs["total_loss"])
    assert np.isfinite(last)
    assert last < first * 0.7, (first, last)

    # eval path produces finite detections overlapping the GT region
    ev = make_eval_step(TINY)
    boxes, scores, labels, valid = ev(state.params, state.batch_stats,
                                      batch, jax.random.PRNGKey(9))
    boxes, scores, valid = map(np.asarray, (boxes, scores, valid))
    assert valid.any()
    assert np.isfinite(boxes[valid]).all()


def test_eval_step_shapes():
    batch = _batch(4)
    tx = make_optimizer(1e-3)
    state = create_train_state(TINY, jax.random.PRNGKey(0), batch, tx)
    ev = make_eval_step(TINY)
    boxes, scores, labels, valid = ev(state.params, state.batch_stats,
                                      batch, jax.random.PRNGKey(2))
    assert boxes.shape == (2, TINY.max_num, 7)
    assert scores.shape == (2, TINY.max_num)
    assert labels.shape == (2, TINY.max_num)
    assert valid.shape == (2, TINY.max_num)


def test_resume_round_trip(tmp_path):
    """VERDICT round-2 item 9: train 3 steps -> save -> restore -> params/
    opt-state/step bitwise equal, and continued training is deterministic
    (same next-step loss from the restored state as from the live one)."""
    from uni3detr_tpu.train.checkpoint import (save_checkpoint,
                                               load_checkpoint,
                                               restore_state)
    batch = _batch(7)
    tx = make_optimizer(step_lr_schedule(1e-3, 10, [5]))
    state = create_train_state(TINY, jax.random.PRNGKey(0), batch, tx)
    step = make_train_step(TINY, donate=False)
    for _ in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(1))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, meta={"epoch": 1, "step": 3})

    # fresh state (different seed -> different params), then restore
    state2 = create_train_state(TINY, jax.random.PRNGKey(42), batch, tx)
    tree, meta = load_checkpoint(path, target_state=state2)
    state2 = restore_state(state2, tree)
    assert meta["step"] == 3
    assert int(state2.step) == int(state.step) == 3

    def assert_tree_equal(a, b, what):
        fa = jax.tree_util.tree_leaves(a)
        fb = jax.tree_util.tree_leaves(b)
        assert len(fa) == len(fb), what
        for x, y in zip(fa, fb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=what)

    assert_tree_equal(state.params, state2.params, "params")
    assert_tree_equal(state.batch_stats, state2.batch_stats, "batch_stats")
    assert_tree_equal(state.opt_state, state2.opt_state, "opt_state")

    # continued training is deterministic across the round trip
    s_a, logs_a = step(state, batch, jax.random.PRNGKey(1))
    s_b, logs_b = step(state2, batch, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(float(logs_a["total_loss"]),
                                  float(logs_b["total_loss"]))
    assert_tree_equal(s_a.params, s_b.params, "params after resume step")


def test_resume_with_constants_in_checkpoint(tmp_path):
    """OV checkpoints additionally store 'constants' (CLIP text
    embeddings); --resume-from restores with the default
    params/batch_stats/opt_state/step template and must tolerate the
    extra on-disk component (regression: orbax structure-mismatch
    ValueError on OV resume)."""
    from flax.core import FrozenDict
    from uni3detr_tpu.train.checkpoint import (save_checkpoint,
                                               load_checkpoint,
                                               restore_state)
    batch = _batch(3)
    tx = make_optimizer(1e-3)
    state = create_train_state(TINY, jax.random.PRNGKey(0), batch, tx)
    state = state.replace(constants=FrozenDict(
        {"head": {"zs_weights": np.ones((3, 16), np.float32)}}))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, meta={"epoch": 1, "step": 0})

    state2 = create_train_state(TINY, jax.random.PRNGKey(1), batch, tx)
    tree, _ = load_checkpoint(path, target_state=state2)
    state2 = restore_state(state2, tree)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state2.params)[0]))
