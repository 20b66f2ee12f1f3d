"""bf16-encoder vs fp32 training-accuracy measurement (VERDICT r2 weak 5).

The reference keeps the sparse encoder fp32 under its fp16 policy
(uni3detr_sunrgbd.py:41 comment) while this repo's presets run the whole
compute path in bf16 (loss/matching already upcast to fp32). This tool
runs the identical synthetic overfit (same seeds, same matcher) with
compute_dtype bf16 vs fp32 and reports the loss trajectory + final
mAP@0.25/0.5 so the bf16 policy is backed by data rather than asserted.

Run: ``python tools/measure_bf16.py [n_steps]`` (forces CPU).
"""
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

N_STEPS = 600
N_EVAL_SCENES = 4


def run(compute_dtype, n_steps, seed=0):
    import jax.numpy as jnp
    from tiny import TINY, synth_scene, pad_batch
    from uni3detr_tpu.train.step import (create_train_state,
                                         make_train_step, make_eval_step,
                                         make_optimizer, step_lr_schedule)
    from uni3detr_tpu.data.eval.indoor_eval import indoor_eval

    cfg = dataclasses.replace(TINY, compute_dtype=compute_dtype)
    rng = np.random.RandomState(seed)
    scenes = [synth_scene(rng) for _ in range(N_EVAL_SCENES)]
    pts, pmask, boxes, labels, gmask = pad_batch(scenes[:2])
    batch = {"points": jnp.asarray(pts), "pts_mask": jnp.asarray(pmask),
             "gt_boxes": jnp.asarray(boxes),
             "gt_labels": jnp.asarray(labels),
             "gt_mask": jnp.asarray(gmask)}
    tx = make_optimizer(step_lr_schedule(2e-3, 1000, [150]))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch, tx)
    step = make_train_step(cfg, donate=False)
    key = jax.random.PRNGKey(7)
    losses = []
    for i in range(n_steps):
        state, logs = step(state, batch, key)
        if (i + 1) % 100 == 0:
            losses.append(round(float(logs["total_loss"]), 4))

    ev = make_eval_step(cfg)
    dets, gts = [], []
    for s in scenes[:2]:
        p, pm, b, l, gm = pad_batch([s])
        eb = {"points": jnp.asarray(p), "pts_mask": jnp.asarray(pm),
              "gt_boxes": jnp.asarray(b), "gt_labels": jnp.asarray(l),
              "gt_mask": jnp.asarray(gm)}
        bo, sc, la, va = map(np.asarray, ev(
            state.params, state.batch_stats, eb, jax.random.PRNGKey(9)))
        dets.append({"boxes": bo[0][va[0]], "scores": sc[0][va[0]],
                     "labels": la[0][va[0]]})
        gts.append({"boxes": s[1], "labels": s[2]})
    res = indoor_eval(gts, dets, ["a", "b", "c"])
    return {"compute_dtype": compute_dtype,
            "loss_per_100_steps": losses,
            "mAP_0.25": round(res["mAP_0.25"], 4),
            "mAP_0.50": round(res["mAP_0.50"], 4)}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_STEPS
    for dt in ("float32", "bfloat16"):
        print(json.dumps(run(dt, n)), flush=True)


if __name__ == "__main__":
    main()
