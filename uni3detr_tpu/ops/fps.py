"""Farthest point sampling (D-FPS) on device.

The reference uses the mmcv CUDA ``furthest_point_sample`` +
``gather_points`` pair, run twice per sample on raw xyz and on voxel
coordinates (uni3detr.py:178-189). Two implementations:

- :func:`farthest_point_sample` — `lax.fori_loop` over the sample count
  with an (N,)-wide min-distance update per step. O(N * S) VPU work but
  each of the S sequential steps pays XLA op-dispatch overhead
  (~70 us/step measured on a v5e -> 22 ms for S=300, N=100k).
- :func:`farthest_point_sample_pallas` — the whole loop inside ONE
  Pallas kernel with xyz and the min-distance state resident in VMEM in
  (rows, 128)-lane layout; each step is a handful of full-width VPU
  passes with no dispatch overhead. Exact same selection order
  (first-max tie-breaking) as the XLA version.

The public entry picks the Pallas kernel on TPU backends and the XLA
formulation elsewhere (CPU tests, interpret-free).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _fps_single(xyz, mask, num_samples):
    """xyz (N, 3), mask (N,) -> indices (S,) int32.

    Matches mmcv semantics: starts from index 0; padded/invalid points are
    never selected (once valid points are exhausted the argmax falls back
    to already-selected valid points, i.e. duplicates).
    """
    N = xyz.shape[0]
    xyz = xyz.astype(jnp.float32)
    big = jnp.float32(1e10)
    mindist = jnp.where(mask, big, -1.0)

    def body(i, state):
        mindist, idx = state
        last = idx[i - 1]
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        mindist = jnp.where(mask, jnp.minimum(mindist, d), -1.0)
        nxt = jnp.argmax(mindist).astype(jnp.int32)
        idx = idx.at[i].set(nxt)
        return mindist, idx

    idx0 = jnp.zeros((num_samples,), jnp.int32)
    _, idx = jax.lax.fori_loop(1, num_samples, body, (mindist, idx0))
    return idx


@functools.partial(jax.jit, static_argnames=("num_samples",))
def farthest_point_sample_xla(xyz, mask, num_samples: int):
    """Batched D-FPS: xyz (B, N, 3), mask (B, N) -> (B, S) indices."""
    return jax.vmap(functools.partial(_fps_single, num_samples=num_samples))(
        xyz, mask)


def _fps_state(xs_ref, mind0_ref, idx_ref, mind_ref, n_rows):
    """Initialize one point set's selection state; returns the loop
    constants (flat index plane, output slot planes, lane iota)."""
    flat = (jax.lax.broadcasted_iota(jnp.int32, (n_rows, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (n_rows, LANES), 1))
    mind_ref[0] = mind0_ref[0]
    s_rows = idx_ref.shape[1]
    srow = jax.lax.broadcasted_iota(jnp.int32, (s_rows, LANES), 0)
    slane = jax.lax.broadcasted_iota(jnp.int32, (s_rows, LANES), 1)
    sflat = srow * LANES + slane
    idx_ref[0] = jnp.zeros((s_rows, LANES), jnp.int32)  # slot 0 -> index 0
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    return flat, sflat, lane_iota


def _fps_step(xs_ref, ys_ref, zs_ref, mind_ref, idx_ref, xs, ys, zs,
              flat, sflat, lane_iota, i, last):
    """One FPS selection step for one point set; returns the next index.

    Extracts the last-selected point's coords with one dynamic (1, 128)
    row slice per plane + a lane one-hot reduce (cheap), instead of a
    full-array masked reduction per coordinate.
    """
    row = last // LANES
    oh = (lane_iota == (last % LANES)).astype(jnp.float32)
    px = jnp.sum(xs_ref[0, pl.ds(row, 1), :] * oh)
    py = jnp.sum(ys_ref[0, pl.ds(row, 1), :] * oh)
    pz = jnp.sum(zs_ref[0, pl.ds(row, 1), :] * oh)
    d = ((xs - px) ** 2 + (ys - py) ** 2 + (zs - pz) ** 2)
    mind = mind_ref[0]
    m = jnp.minimum(mind, d)
    m = jnp.where(mind < 0, mind, m)  # invalid stays -1
    mind_ref[0] = m
    mx = jnp.max(m)
    nxt = jnp.min(jnp.where(m == mx, flat, jnp.int32(2 ** 30)))
    idx_ref[0] = jnp.where(sflat == i, nxt, idx_ref[0])
    return nxt


def _fps_kernel(xs_ref, ys_ref, zs_ref, mind0_ref, idx_ref, mind_ref,
                *, num_samples, n_rows):
    """One batch element. All arrays are (R, 128) fp32 except the output
    index planes. Selection state lives entirely in VMEM/vregs; the only
    per-step scalars are loop carries (no scalar VMEM traffic).
    """
    xs = xs_ref[0]
    ys = ys_ref[0]
    zs = zs_ref[0]
    flat, sflat, lane_iota = _fps_state(xs_ref, mind0_ref, idx_ref,
                                        mind_ref, n_rows)

    def body(i, last):
        return _fps_step(xs_ref, ys_ref, zs_ref, mind_ref, idx_ref,
                         xs, ys, zs, flat, sflat, lane_iota, i, last)

    jax.lax.fori_loop(1, num_samples, body, jnp.int32(0))


def _fps_pair_kernel(xa_ref, ya_ref, za_ref, ma0_ref,
                     xb_ref, yb_ref, zb_ref, mb0_ref,
                     ia_ref, ib_ref, ma_ref, mb_ref,
                     *, num_samples, rows_a, rows_b):
    """TWO independent point sets sampled in ONE interleaved loop.

    Each FPS step is a short dependency chain (distance update ->
    global max -> argmin extract) that leaves the VPU mostly idle —
    measured ~8.6 us/step for N=100k where the element work is <1 us.
    The model runs FPS twice back-to-back (raw xyz + voxel coords,
    detector.py) and XLA executes kernels serially, so fusing the pair
    lets the two chains overlap and halves the wall time."""
    xa, ya, za = xa_ref[0], ya_ref[0], za_ref[0]
    xb, yb, zb = xb_ref[0], yb_ref[0], zb_ref[0]
    fa, sfa, la = _fps_state(xa_ref, ma0_ref, ia_ref, ma_ref, rows_a)
    fb, sfb, lb = _fps_state(xb_ref, mb0_ref, ib_ref, mb_ref, rows_b)

    def body(i, carry):
        last_a, last_b = carry
        nxt_a = _fps_step(xa_ref, ya_ref, za_ref, ma_ref, ia_ref,
                          xa, ya, za, fa, sfa, la, i, last_a)
        nxt_b = _fps_step(xb_ref, yb_ref, zb_ref, mb_ref, ib_ref,
                          xb, yb, zb, fb, sfb, lb, i, last_b)
        return nxt_a, nxt_b

    jax.lax.fori_loop(1, num_samples, body,
                      (jnp.int32(0), jnp.int32(0)))


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def farthest_point_sample_pallas(xyz, mask, num_samples: int,
                                 interpret: bool = False):
    """Batched D-FPS as one Pallas program per batch element."""
    B, N, _ = xyz.shape
    R = -(-N // LANES)
    Np = R * LANES
    xyz = xyz.astype(jnp.float32)
    pad = Np - N
    planes = jnp.moveaxis(
        jnp.pad(xyz, ((0, 0), (0, pad), (0, 0))), -1, 1)  # (B, 3, Np)
    planes = planes.reshape(B, 3, R, LANES)
    maskp = jnp.pad(mask, ((0, 0), (0, pad)))
    mind0 = jnp.where(maskp, jnp.float32(1e10), -1.0).reshape(B, R, LANES)
    SR = -(-num_samples // LANES)

    idx, _ = pl.pallas_call(
        functools.partial(_fps_kernel, num_samples=num_samples, n_rows=R),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, SR, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, SR, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, R, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(planes[:, 0], planes[:, 1], planes[:, 2], mind0)
    return idx.reshape(B, SR * LANES)[:, :num_samples]


def farthest_point_sample(xyz, mask, num_samples: int):
    """Batched D-FPS: xyz (B, N, 3), mask (B, N) -> (B, S) indices.

    Dispatches to the Pallas kernel on TPU, the XLA loop elsewhere.
    """
    if jax.devices()[0].platform == "cpu":
        return farthest_point_sample_xla(xyz, mask, num_samples)
    return farthest_point_sample_pallas(xyz, mask, num_samples)


def _fps_planes(xyz, mask):
    B, N, _ = xyz.shape
    R = -(-N // LANES)
    pad = R * LANES - N
    planes = jnp.moveaxis(
        jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, pad), (0, 0))),
        -1, 1).reshape(B, 3, R, LANES)
    maskp = jnp.pad(mask, ((0, 0), (0, pad)))
    mind0 = jnp.where(maskp, jnp.float32(1e10), -1.0).reshape(B, R, LANES)
    return planes, mind0, R


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def farthest_point_sample_pair_pallas(xyz_a, mask_a, xyz_b, mask_b,
                                      num_samples: int,
                                      interpret: bool = False):
    """Two batched D-FPS problems in one interleaved Pallas program."""
    B = xyz_a.shape[0]
    pa, ma0, RA = _fps_planes(xyz_a, mask_a)
    pb, mb0, RB = _fps_planes(xyz_b, mask_b)
    SR = -(-num_samples // LANES)
    vspec = lambda R: pl.BlockSpec((1, R, LANES), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)
    idx_a, idx_b, _, _ = pl.pallas_call(
        functools.partial(_fps_pair_kernel, num_samples=num_samples,
                          rows_a=RA, rows_b=RB),
        grid=(B,),
        in_specs=[vspec(RA)] * 4 + [vspec(RB)] * 4,
        out_specs=[vspec(SR), vspec(SR), vspec(RA), vspec(RB)],
        out_shape=[
            jax.ShapeDtypeStruct((B, SR, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, SR, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, RA, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, RB, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(pa[:, 0], pa[:, 1], pa[:, 2], ma0,
      pb[:, 0], pb[:, 1], pb[:, 2], mb0)
    take = lambda ix: ix.reshape(B, SR * LANES)[:, :num_samples]
    return take(idx_a), take(idx_b)


def farthest_point_sample_pair(xyz_a, mask_a, xyz_b, mask_b,
                               num_samples: int):
    """Two independent D-FPS samples fused into one TPU kernel (the
    detectors' raw-points + voxel-coords pair); falls back to two XLA
    runs on CPU. Selection order is identical to two
    ``farthest_point_sample`` calls."""
    if jax.devices()[0].platform == "cpu":
        return (farthest_point_sample_xla(xyz_a, mask_a, num_samples),
                farthest_point_sample_xla(xyz_b, mask_b, num_samples))
    return farthest_point_sample_pair_pallas(xyz_a, mask_a, xyz_b,
                                             mask_b, num_samples)
