"""Pallas TPU kernel for the auction assignment solver.

The XLA while_loop formulation of the auction (ops/matching.py) pays
per-iteration dispatch + HBM round-trips for its value matrix; this
kernel runs the auction inside one Pallas program with the benefit
matrix and all solver state resident in VMEM; each Jacobi round is a
handful of dense (M, N) VPU passes formulated without gathers/scatters
(one-hot compares against broadcasted iota).

Formulation: **asymmetric single-phase** forward auction — M bidders
(GT columns) over N items (queries), M <= N, all prices starting at 0.
With zero-initialized prices the standard eps-CS argument gives
M*eps-optimality directly: any alternative assignment can only use items
that are either ours (same price) or unassigned (price still 0, the
minimum), so the price terms cancel. Round-1 of this repo instead padded
the problem square with jittered dummy bidders; the resulting
dummy-vs-dummy price wars took ~4300 Jacobi rounds (~24 ms) per
instance and dominated the train step (423 of 791 ms). The asymmetric
form needs 2-3 rounds on DETR-shaped costs (measured; worst adversarial
case — duplicated gt_repeattimes bidders on clustered costs — ~1200
rounds with <1e-3 relative gap at eps = spread/2048).

Epsilon scaling is deliberately NOT used: warm-starting prices across
phases is only sound when every item ends assigned (square case) —
with M < N a previously-assigned-now-free item keeps a stale positive
price and the optimality bound breaks (verified empirically: 20%
gaps). One fine phase is both correct and, without dummy bidders,
cheap.

Grid: one program per LAP instance (batch x groups fold into the grid).
N must be a multiple of 128, M a multiple of 8 (callers pad; see
``matching.match_queries_to_gt``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _auction_kernel(spread_ref, benefit_ref, out_ref, *, eps_div,
                    max_iters):
    benefit = benefit_ref[0]  # (M, N) rows = bidders, cols = items
    M, N = benefit.shape
    spread = spread_ref[pl.program_id(0)]  # scalar-prefetch (G,) in SMEM
    eps = spread / eps_div
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (M, N), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (M, N), 1)

    def one_round(state):
        it, item_of, owner, price = state
        active = item_of < 0                              # (M, 1)
        value = benefit - price                           # (M, N)
        v1 = jnp.max(value, axis=1, keepdims=True)        # (M, 1)
        idx1 = jnp.argmax(value, axis=1).astype(jnp.int32)[:, None]
        top_mask = col_ids == idx1
        masked = jnp.where(top_mask, NEG, value)
        v2 = jnp.max(masked, axis=1, keepdims=True)
        v2 = jnp.where(v2 <= NEG / 2, v1, v2)
        p_top = jnp.max(jnp.where(top_mask, price, NEG), axis=1,
                        keepdims=True)
        bid = p_top + (v1 - v2) + eps
        bid = jnp.where(active, bid, NEG)
        # per-item best bid / winner (first max = lowest bidder idx)
        bid_mat = jnp.where(top_mask & active, bid, NEG)  # (M, N)
        best_bid = jnp.max(bid_mat, axis=0, keepdims=True)  # (1, N)
        has_bid = best_bid > NEG / 2
        winner = jnp.argmax(bid_mat, axis=0
                            ).astype(jnp.int32)[None, :]  # (1, N)
        # evict previous owners of re-assigned items
        evicted = jnp.max(
            jnp.where((owner == row_ids) & has_bid, 1, 0),
            axis=1, keepdims=True) > 0                    # (M, 1)
        item_of = jnp.where(evicted, -1, item_of)
        # install winners: bidder i gets item j where winner_j == i
        new_item = jnp.max(
            jnp.where((winner == row_ids) & has_bid, col_ids, -1),
            axis=1, keepdims=True)                        # (M, 1)
        item_of = jnp.where(new_item >= 0, new_item, item_of)
        owner = jnp.where(has_bid, winner, owner)
        price = jnp.where(has_bid, best_bid, price)
        return it + 1, item_of, owner, price

    def cond(state):
        it, item_of, owner, price = state
        return (it < max_iters) & jnp.any(item_of < 0)

    price = jnp.zeros((1, N), jnp.float32)
    item_of = jnp.full((M, 1), -1, jnp.int32)
    owner = jnp.full((1, N), -1, jnp.int32)
    _, item_of, owner, price = jax.lax.while_loop(
        cond, one_round, (jnp.int32(0), item_of, owner, price))
    # output tile is (8, M) for sublane alignment; row 0 carries the result
    out_ref[0] = jnp.broadcast_to(item_of[:, 0][None, :], (8, M))


def auction_lap_pallas(benefit, spread, eps_div: float = 2048.0,
                       max_iters: int = 20000, interpret: bool = False):
    """benefit (G, M, N) f32 (rows bidders, cols items, M % 8 == 0,
    N % 128 == 0, M <= N); spread (G,) f32 epsilon scale. Returns
    item_of (G, M) int32 (assigned item per bidder, -1 if max_iters
    hit). eps = spread / eps_div; the gap bound is M * eps."""
    G, M, N = benefit.shape
    kernel = functools.partial(_auction_kernel, eps_div=eps_div,
                               max_iters=max_iters)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, M, N), lambda g, sref: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, M), lambda g, sref: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, 8, M), jnp.int32),
        interpret=interpret,
    )(spread.reshape(G), benefit)
    return out[:, 0, :]
