"""Matcher-quality measurement: auction phases vs exact scipy.

Answers two questions with data (VERDICT round-1, weak #4):
1. assignment optimality — relative total-cost gap and fraction of
   flipped assignments vs scipy on cost matrices sampled from real
   training steps;
2. end-metric impact — synthetic-overfit mAP@0.25/0.5 after identical
   training runs that differ only in the matcher
   (auction default / auction 4-phase / scipy-exact).

Run: ``env JAX_PLATFORMS=cpu python tools/measure_matcher.py``
(CPU exercises the XLA auction; on TPU the Pallas kernel path runs
instead — same eps schedule). Prints one JSON line per matcher plus a
summary; results are recorded in STATUS.md.
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

# this environment pre-imports jax on the axon TPU platform; the env var
# alone is too late (see tests/conftest.py) — force through jax.config
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

N_STEPS = 600
N_EVAL_SCENES = 8


def assignment_gap(n_trials=50, nq=300, gt=32, seed=0):
    """Relative cost gap + flip rate of the auction vs scipy."""
    import jax.numpy as jnp
    from scipy.optimize import linear_sum_assignment
    from uni3detr_tpu.ops.matching import auction_lap

    rng = np.random.RandomState(seed)
    rows = {p: {"gap": [], "flips": []} for p in (2, 3, 4)}
    for _ in range(n_trials):
        cost = rng.randn(gt, nq).astype(np.float32) * 2.0
        r, c = linear_sum_assignment(cost)
        opt = cost[r, c].sum()
        for p in rows:
            got = np.asarray(auction_lap(jnp.asarray(cost), n_phases=p))
            val = cost[np.arange(gt), got].sum()
            rows[p]["gap"].append((val - opt) / max(abs(opt), 1e-9))
            rows[p]["flips"].append(float((got != c).mean()))
    return {f"phases_{p}": {
        "mean_rel_cost_gap": float(np.mean(v["gap"])),
        "max_rel_cost_gap": float(np.max(v["gap"])),
        "mean_flip_rate": float(np.mean(v["flips"]))}
        for p, v in rows.items()}


def overfit_map(matcher, phases, seed=0):
    import jax
    import jax.numpy as jnp
    from tiny import TINY, synth_scene, pad_batch
    from uni3detr_tpu.train.step import (create_train_state,
                                         make_train_step, make_eval_step,
                                         make_optimizer, step_lr_schedule)
    from uni3detr_tpu.data.eval.indoor_eval import indoor_eval

    cfg = dataclasses.replace(TINY, matcher=matcher,
                              matcher_phases=phases)
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
    state, logs = step(state, batch, key)  # compile
    jax.block_until_ready(logs["total_loss"])
    t0 = time.perf_counter()
    for _ in range(N_STEPS - 1):
        state, logs = step(state, batch, key)
    jax.block_until_ready(logs["total_loss"])
    ms_per_step = (time.perf_counter() - t0) / (N_STEPS - 1) * 1e3

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
    return {"matcher": matcher, "phases": phases,
            "final_loss": round(float(logs["total_loss"]), 4),
            "ms_per_step": round(ms_per_step, 2),
            "mAP_0.25": round(res["mAP_0.25"], 4),
            "mAP_0.50": round(res["mAP_0.50"], 4)}


def main():
    print(json.dumps({"assignment_gap_vs_scipy":
                      assignment_gap()}, indent=None))
    for matcher, phases in (("auction", None), ("auction", 4),
                            ("scipy", None)):
        print(json.dumps(overfit_map(matcher, phases)))


if __name__ == "__main__":
    main()
