"""Batched-matrix 3D / rotated-BEV NMS and gaussian soft-NMS on device.

The reference calls mmcv CUDA ``nms3d`` (uni3detr_head.py:861) and
``nms_bev`` (merge_all_augs.py:70-83), plus a python-loop soft-NMS
(uni3detr_head.py:796-823). Here the IoU matrix is computed once with the
exact rotated-polygon kernel and suppression runs as a data-dependent
wavefront over the suppression DAG — one XLA program, static shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..geom.iou import iou3d_rotated, iou_bev_rotated


def _greedy_suppress_serial(iou, scores, valid, iou_thr):
    """Reference greedy NMS: one `fori_loop` step per box in score order.

    Exact semantics oracle for :func:`_greedy_suppress`; N sequential
    steps make it latency-bound on TPU (~N x 2-3 us regardless of box
    count actually alive).
    """
    N = scores.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))

    def body(k, state):
        alive, keep = state
        i = order[k]
        is_kept = alive[i] & valid[i]
        keep = keep.at[i].set(is_kept)
        suppress = is_kept & (iou[i] > iou_thr)
        alive = alive & ~suppress
        alive = alive.at[i].set(False)
        return alive, keep

    alive0 = jnp.ones((N,), bool)
    keep0 = jnp.zeros((N,), bool)
    _, keep = jax.lax.fori_loop(0, N, body, (alive0, keep0))
    return keep


def _greedy_suppress(iou, scores, valid, iou_thr):
    """Greedy NMS given a precomputed IoU matrix — wavefront form.

    Identical keep set to :func:`_greedy_suppress_serial` (same
    descending-score order, argsort index tie-break), but instead of one
    sequential step per box it decides, per `while_loop` iteration, EVERY
    box whose higher-ranked overlapping boxes are all decided (a ready
    box is kept iff no higher-ranked KEPT box overlaps it). Iteration
    count = longest suppression chain in the score-ordered overlap DAG
    (typically <10 at detection thresholds vs N=1000 serial steps); each
    iteration is full-width (N, N) vector work. Progress is guaranteed:
    the minimal-rank undecided box is always ready.
    """
    N = scores.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    rank = jnp.zeros((N,), jnp.int32).at[order].set(
        jnp.arange(N, dtype=jnp.int32))
    # M[j, k]: j (valid, strictly higher-ranked) can suppress k (valid)
    overl = (iou > iou_thr) & valid[:, None] & valid[None, :]
    M = overl & (rank[:, None] < rank[None, :])

    def cond(state):
        decided, _ = state
        return ~jnp.all(decided)

    def body(state):
        decided, kept = state
        blocked = jnp.any(M & ~decided[:, None], axis=0)
        ready = ~decided & ~blocked
        sup = jnp.any(M & kept[:, None], axis=0)
        kept = kept | (ready & ~sup)
        return decided | ready, kept

    decided0 = ~valid
    kept0 = jnp.zeros((N,), bool)
    _, keep = jax.lax.while_loop(cond, body, (decided0, kept0))
    return keep


@functools.partial(jax.jit, static_argnames=("z_origin",))
def nms3d(boxes, scores, valid, iou_thr, z_origin: str = "bottom"):
    """Rotated 3D-IoU NMS. boxes (N, 7) storage layout (bottom z).

    Matches mmcv ``nms3d`` (rotated BEV polygon x z-overlap IoU).
    Returns keep mask (N,).
    """
    iou = iou3d_rotated(boxes, boxes, z_origin=z_origin)
    return _greedy_suppress(iou, scores, valid, iou_thr)


@jax.jit
def nms_bev_rotated(boxes, scores, valid, iou_thr):
    """Rotated BEV-IoU NMS (mmcv ``nms_bev`` equivalent). boxes (N, >=7)."""
    iou = iou_bev_rotated(boxes, boxes)
    return _greedy_suppress(iou, scores, valid, iou_thr)


@functools.partial(jax.jit, static_argnames=("max_out", "z_origin"))
def soft_nms3d(boxes, scores, valid, gaussian_sigma=0.3,
               prune_threshold=1e-3, max_out: int = 256,
               z_origin: str = "bottom"):
    """Gaussian soft-NMS (reference uni3detr_head.py:796-823).

    Iteratively takes the argmax-score box, records it, and decays all
    remaining scores by exp(-iou^2 / sigma); boxes whose decayed score
    falls below prune_threshold are dropped. Returns (indices (max_out,),
    new_scores (max_out,), out_valid (max_out,)).
    """
    iou = iou3d_rotated(boxes, boxes, z_origin=z_origin)
    neg = -jnp.inf

    def body(k, state):
        live_scores, idxs, outs, nout = state
        top = jnp.argmax(live_scores).astype(jnp.int32)
        top_score = live_scores[top]
        ok = top_score > prune_threshold
        idxs = idxs.at[k].set(jnp.where(ok, top, -1))
        outs = outs.at[k].set(jnp.where(ok, top_score, 0.0))
        decay = jnp.exp(-(iou[top] ** 2) / gaussian_sigma)
        live_scores = jnp.where(ok, live_scores * decay, live_scores)
        live_scores = live_scores.at[top].set(
            jnp.where(ok, neg, live_scores[top]))
        nout = nout + ok.astype(jnp.int32)
        return live_scores, idxs, outs, nout

    live0 = jnp.where(valid, scores, neg)
    idxs0 = jnp.full((max_out,), -1, jnp.int32)
    outs0 = jnp.zeros((max_out,), scores.dtype)
    live, idxs, outs, nout = jax.lax.fori_loop(
        0, max_out, body, (live0, idxs0, outs0, jnp.int32(0)))
    return idxs, outs, idxs >= 0
