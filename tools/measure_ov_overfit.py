"""OV (multimodal) synthetic-overfit measurement.

The lidar path's training correctness is pinned by overfit runs reaching
mAP ~1.0 (tests/test_train.py, tools/measure_bf16.py). This tool runs
the SAME experiment through the FULL OV model — image branch (ResNet+FPN
+ depth net + Uni3DViewTrans lift), modality-dropout fusion, CLIP head
with uncertainty branch — so the multimodal/open-vocab training path has
the same evidence. Images are procedural noise (the synthetic camera
carries geometry only), so the signal must flow through the lidar branch
and survive fusion + the 3-way modality dropout
(reference ov_uni3detr.py:288-295).

Run: ``python tools/measure_ov_overfit.py [n_steps]`` (forces CPU).
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

N_STEPS = 600
N_SCENES = 2


def make_batch():
    import jax.numpy as jnp
    from tiny import synth_scene, pad_batch
    rng = np.random.RandomState(0)
    scenes = [synth_scene(rng) for _ in range(N_SCENES)]
    pts, pmask, boxes, labels, gmask = pad_batch(scenes)
    B = len(scenes)
    # pinhole at origin looking +y (tests/test_ov.py geometry)
    K = np.array([[20.0, 0, 16, 0], [0, 20.0, 16, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    T = np.array([[1, 0, 0, 0], [0, 0, -1, 0],
                  [0, 1, 0, 2.5], [0, 0, 0, 1]], np.float32)
    batch = {
        "points": jnp.asarray(pts), "pts_mask": jnp.asarray(pmask),
        "images": jnp.asarray(rng.rand(B, 1, 32, 32, 3).astype(np.float32)),
        "lidar2img": jnp.asarray((K @ T)[None, None].repeat(B, 0)),
        "uni_rot_aug": jnp.asarray(
            np.eye(3, dtype=np.float32)[None].repeat(B, 0)),
        "gt_boxes": jnp.asarray(boxes), "gt_labels": jnp.asarray(labels),
        "gt_mask": jnp.asarray(gmask),
    }
    return batch, scenes


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else N_STEPS
    from test_ov import OV_TINY
    from uni3detr_tpu.train.step import (create_train_state,
                                         make_train_step, make_eval_step,
                                         make_optimizer, step_lr_schedule)
    from uni3detr_tpu.data.eval.indoor_eval import indoor_eval

    cfg = OV_TINY
    batch, scenes = make_batch()
    tx = make_optimizer(step_lr_schedule(1e-3, n_steps, [int(n_steps * .7)]))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch, tx)
    step = make_train_step(cfg, donate=False)
    losses = []
    for i in range(n_steps):
        state, logs = step(state, batch, jax.random.PRNGKey(i))
        if i % 50 == 0 or i == n_steps - 1:
            losses.append((i, float(logs["total_loss"])))
            print(f"step {i}: total {float(logs['total_loss']):.4f} "
                  f"cls {float(logs['loss_cls']):.4f} "
                  f"bbox {float(logs['loss_bbox']):.4f} "
                  f"iou {float(logs['loss_iou']):.4f}", flush=True)

    eval_fn = make_eval_step(cfg)
    boxes, scores, labels, valid = eval_fn(
        state.params, state.batch_stats, batch, jax.random.PRNGKey(99),
        constants=state.constants)
    boxes, scores, labels, valid = map(np.asarray,
                                       (boxes, scores, labels, valid))
    dets, gts = [], []
    for b, (p, gb, gl) in enumerate(scenes):
        v = valid[b]
        dets.append({"boxes": boxes[b][v], "scores": scores[b][v],
                     "labels": labels[b][v]})
        gts.append({"boxes": gb, "labels": gl})
    res = indoor_eval(gts, dets, ["a", "b", "c"])
    out = {"n_steps": n_steps, "losses": losses,
           "mAP_0.25": res["mAP_0.25"], "mAP_0.50": res["mAP_0.50"]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
