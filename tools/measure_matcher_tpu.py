"""On-TPU matcher optimality gap at production shapes (VERDICT r3 #5).

tests/test_matcher_shapes.py pins the auction-vs-scipy gap on the CPU
XLA path; on the axon runtime scipy host callbacks are unavailable, so
the Pallas auction kernel is load-bearing on-chip. This tool runs the
SAME fixed-seed production-shape cost matrices through
``match_queries_to_gt`` on the default (TPU) backend and compares the
realized total cost against the scipy optimum computed host-side.

Shapes (mirroring the reference presets — SURVEY.md §2.1
HungarianAssigner3D; /root/reference/projects/configs/*):
- KITTI one-to-many: nq=300, 50 GTs x gt_repeat=5, phases=3, 3 groups;
- adversarial duplicated columns (price-war worst case);
- nuScenes: nq=900, 90 GTs, 3 groups; plus the low-rank near-tie case.

Run: ``python tools/measure_matcher_tpu.py`` (on the TPU host).
Prints one JSON line per case and exits non-zero if any relative gap
exceeds 1e-3. Results are recorded in STATUS.md.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax  # noqa: E402
jax.config.update("jax_enable_compilation_cache", False)
import jax.numpy as jnp  # noqa: E402
from scipy.optimize import linear_sum_assignment  # noqa: E402

from test_matcher_shapes import _detr_like_cost  # noqa: E402
from uni3detr_tpu.ops.matching import match_queries_to_gt  # noqa: E402

GAP_TOL = 1e-3


def run_case(name, cost_np, gt_valid, nq, repeat, phases, groups):
    dev_cost = jax.device_put(jnp.asarray(cost_np))
    assigned = np.asarray(match_queries_to_gt(
        dev_cost, jnp.asarray(gt_valid), nq, gt_repeat=repeat,
        method="auction", phases=phases))
    auc = sum(float(cost_np[q, assigned[q]])
              for q in range(len(assigned)) if assigned[q] >= 0)
    sci = 0.0
    real = np.where(gt_valid)[0]
    for g in range(groups):
        c = cost_np[g * nq:(g + 1) * nq][:, real].astype(np.float64)
        c = np.tile(c, (1, repeat))
        r, col = linear_sum_assignment(c)
        sci += c[r, col].sum()
    gap = (auc - sci) / max(abs(sci), 1e-9)
    row = {"case": name, "backend": jax.default_backend(),
           "nq": nq, "repeat": repeat, "groups": groups,
           "auction_total": round(auc, 4), "scipy_total": round(sci, 4),
           "rel_gap": float(f"{gap:.3e}"), "pass": bool(gap <= GAP_TOL)}
    print(json.dumps(row))
    return row


def main():
    rng = np.random.RandomState(0)
    rows = [run_case("kitti_one_to_many",
                     _detr_like_cost(rng, 3 * 300, 50, 50),
                     np.ones(50, bool), 300, 5, 3, 3)]

    rng = np.random.RandomState(1)
    base = _detr_like_cost(rng, 3 * 300, 10, 10)
    cost = np.concatenate([base] * 5, axis=1)
    cost += rng.randn(*cost.shape).astype(np.float32) * 1e-6
    rows.append(run_case("kitti_adversarial_duplicates", cost,
                         np.ones(50, bool), 300, 5, 3, 3))

    rng = np.random.RandomState(2)
    rows.append(run_case("nuscenes",
                         _detr_like_cost(rng, 3 * 900, 90, 90),
                         np.ones(90, bool), 900, 1, None, 3))

    rng = np.random.RandomState(3)
    u = rng.randn(3 * 900, 3).astype(np.float32)
    v = rng.randn(3, 90).astype(np.float32)
    cost = np.zeros((3 * 900, 90), np.float32)
    cost[:, :90] = u @ v + 1e-4 * rng.randn(3 * 900, 90)
    rows.append(run_case("nuscenes_lowrank", cost,
                         np.ones(90, bool), 900, 1, None, 3))

    worst = max(r["rel_gap"] for r in rows)
    ok = all(r["pass"] for r in rows)
    print(json.dumps({"summary": "matcher_tpu_gap", "worst_rel_gap": worst,
                      "tol": GAP_TOL, "all_pass": ok}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
