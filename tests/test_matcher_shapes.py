"""Matcher worst-case bounds at PRODUCTION shapes (VERDICT r2 item 6).

On the axon TPU runtime host callbacks are unavailable, so the on-device
auction is load-bearing — these tests pin its optimality gap against
scipy at the real shapes the presets use, on the CPU XLA path:

- KITTI one-to-many: nq=300, 50 GTs x gt_repeat=5 (duplicated bidder
  columns, the price-war worst case), preset eps phases=3;
- nuScenes: nq=900, 90 GTs;
- adversarial variants: exactly duplicated GT costs with epsilon noise,
  and low-rank (clustered/near-tie) costs.

Acceptance: relative total-cost gap <= 1e-3 (measured gaps are recorded
in STATUS.md; tools/measure_matcher.py has the timing side).
"""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from uni3detr_tpu.ops.matching import match_queries_to_gt

GAP_TOL = 1e-3


def _total_costs(cost_np, gt_valid, nq, repeat, phases, groups):
    """Returns (auction_total, scipy_total) summed over groups.

    cost_np: (groups*nq, Gt) with padded columns included."""
    Gt = cost_np.shape[1]
    assigned = np.asarray(match_queries_to_gt(
        jnp.asarray(cost_np), jnp.asarray(gt_valid), nq,
        gt_repeat=repeat, method="auction", phases=phases))
    auc_total = 0.0
    for q in range(len(assigned)):
        if assigned[q] >= 0:
            auc_total += float(cost_np[q, assigned[q]])

    sci_total = 0.0
    real = np.where(gt_valid)[0]
    for g in range(groups):
        c = cost_np[g * nq:(g + 1) * nq][:, real].astype(np.float64)
        c = np.tile(c, (1, repeat))                    # (nq, n_real*rep)
        r, col = linear_sum_assignment(c)
        sci_total += c[r, col].sum()
    return auc_total, sci_total


def _check(cost, gt_valid, nq, repeat, phases, groups):
    auc, sci = _total_costs(cost, gt_valid, nq, repeat, phases, groups)
    gap = (auc - sci) / max(abs(sci), 1e-9)
    # fp32 cost sums leave ~1e-6 relative accumulation noise either way
    assert gap >= -1e-5, "auction total below the optimum (bug)"
    assert gap <= GAP_TOL, f"relative gap {gap:.2e} > {GAP_TOL}"


def _detr_like_cost(rng, rows, n_real, Gt):
    """Production-like cost: focal cls (+-4) + 0.25*L1 (0..2) + 1.2*IoU
    (0..1.2) terms."""
    cls = rng.randn(rows, n_real) * 2.0
    l1 = rng.rand(rows, n_real) * 8.0 * 0.25
    iou = rng.rand(rows, n_real) * 1.2
    cost = np.zeros((rows, Gt), np.float32)
    cost[:, :n_real] = cls + l1 + iou
    return cost


def test_kitti_shape_one_to_many():
    """nq=300, 50 real GTs, repeat=5, 3 train groups, preset phases=3."""
    rng = np.random.RandomState(0)
    nq, Gt, n_real, rep, groups = 300, 50, 50, 5, 3
    cost = _detr_like_cost(rng, groups * nq, n_real, Gt)
    gt_valid = np.ones(Gt, bool)
    _check(cost, gt_valid, nq, rep, 3, groups)


def test_kitti_shape_adversarial_duplicates():
    """Exactly duplicated GT columns + 1e-6 noise: identical bidders
    fight maximal price wars; near-ties are between identical copies so
    any resolution is optimal-cost."""
    rng = np.random.RandomState(1)
    nq, Gt, rep, groups = 300, 50, 5, 3
    base = _detr_like_cost(rng, groups * nq, 10, 10)
    cost = np.concatenate([base] * 5, axis=1)          # 50 cols, 5 dups
    cost += rng.randn(*cost.shape).astype(np.float32) * 1e-6
    gt_valid = np.ones(Gt, bool)
    _check(cost, gt_valid, nq, rep, 3, groups)


def test_nuscenes_shape():
    """nq=900, 90 real GTs in a 90-col budget, 3 train groups."""
    rng = np.random.RandomState(2)
    nq, Gt, groups = 900, 90, 3
    cost = _detr_like_cost(rng, groups * nq, 90, Gt)
    gt_valid = np.ones(Gt, bool)
    _check(cost, gt_valid, nq, 1, None, groups)


def test_nuscenes_shape_clustered_lowrank():
    """Low-rank cost (few effective 'object prototypes') creates global
    near-tie structure — the eps-scaling worst case."""
    rng = np.random.RandomState(3)
    nq, Gt, groups = 900, 90, 3
    u = rng.randn(groups * nq, 3).astype(np.float32)
    v = rng.randn(3, 90).astype(np.float32)
    cost = np.zeros((groups * nq, Gt), np.float32)
    cost[:, :90] = u @ v + 1e-4 * rng.randn(groups * nq, 90)
    gt_valid = np.ones(Gt, bool)
    _check(cost, gt_valid, nq, 1, None, groups)


def test_partial_gt_padding():
    """Padded GT columns (gt_valid False) must not perturb the real
    assignment at production shape."""
    rng = np.random.RandomState(4)
    nq, Gt, n_real, groups = 300, 50, 17, 1
    cost = _detr_like_cost(rng, groups * nq, n_real, Gt)
    cost[:, n_real:] = rng.randn(nq, Gt - n_real) * 100  # garbage in pads
    gt_valid = np.zeros(Gt, bool)
    gt_valid[:n_real] = True
    assigned = np.asarray(match_queries_to_gt(
        jnp.asarray(cost), jnp.asarray(gt_valid), nq, gt_repeat=1,
        method="auction"))
    assert (assigned < n_real).all()
    assert (assigned >= 0).sum() == n_real
    auc = sum(cost[q, assigned[q]] for q in range(nq) if assigned[q] >= 0)
    r, c = linear_sum_assignment(cost[:, :n_real].T)
    sci = cost[:, :n_real].T[r, c].sum()
    gap = (auc - sci) / max(abs(sci), 1e-9)
    assert gap <= GAP_TOL, gap
