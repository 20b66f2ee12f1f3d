"""Static-shape voxelization for TPU.

The reference uses the mmcv CUDA ``Voxelization`` op (hard, with per-voxel
point caps and a max-voxel budget; uni3detr.py:148, cfg
uni3detr_sunrgbd.py:28-30) and ``dynamic_scatter`` for the dynamic path
(uni3detr.py:155-171 + DynamicSimpleVFE). Both fuse here with the
mean-pooling VFE (HardSimpleVFE / DynamicSimpleVFE) into a single
sort + segment-reduction program: XLA-friendly, fully static shapes, no
host sync. The atomics-based CUDA scatter becomes a radix sort over linear
voxel ids — the TPU-native formulation (sorts vectorize; atomics don't).

Conventions: ``grid_size = (D, H, W)`` over (z, y, x); voxel coords are
returned as integer ``(z, y, x)`` like the reference's ``coors`` columns
(sparse_encoder_hd.py:112-113).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def _voxel_ids(points, mask, pc_range, voxel_size, grid_size):
    """Per-point linear voxel id (z*H*W + y*W + x) or -1 if invalid."""
    D, H, W = grid_size
    x0, y0, z0 = pc_range[0], pc_range[1], pc_range[2]
    ix = jnp.floor((points[:, 0] - x0) / voxel_size[0]).astype(jnp.int32)
    iy = jnp.floor((points[:, 1] - y0) / voxel_size[1]).astype(jnp.int32)
    iz = jnp.floor((points[:, 2] - z0) / voxel_size[2]).astype(jnp.int32)
    inb = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
           & (iz >= 0) & (iz < D) & mask)
    lin = (iz * H + iy) * W + ix
    return jnp.where(inb, lin, -1), inb


def _voxelize_single(points, mask, pc_range, voxel_size, grid_size,
                     max_points, max_voxels):
    """One sample. points (P, C) xyz-first, mask (P,) valid.

    Returns (feats (V, C) mean over <=max_points pts, coords (V, 3) int32
    (z, y, x), vmask (V,)). Voxels are emitted in ascending linear-id order
    (the reference emits in first-occurrence order; only the drop set under
    the voxel cap differs, which is itself nondeterministic upstream).
    """
    P, C = points.shape
    D, H, W = grid_size
    V = max_voxels
    lin, valid = _voxel_ids(points, mask, pc_range, voxel_size, grid_size)
    sort_key = jnp.where(valid, lin, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(sort_key)  # stable: keeps point order inside voxel
    s_lin = sort_key[order]
    s_valid = valid[order]
    s_pts = points[order]

    iota = jnp.arange(P, dtype=jnp.int32)
    newseg = jnp.concatenate(
        [jnp.ones((1,), bool), s_lin[1:] != s_lin[:-1]]) & s_valid
    seg_id = jnp.cumsum(newseg.astype(jnp.int32)) - 1  # (P,)
    # rank of point within its voxel = i - start_index(segment)
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(newseg, iota, -1))
    rank = iota - seg_start
    if max_points > 0:
        keep = s_valid & (rank < max_points) & (seg_id < V)
    else:
        keep = s_valid & (seg_id < V)

    # Per-voxel sums via cumulative-sum differences over the sorted list
    # instead of a P-row scatter-add: on a v5e the (P, C) scatter was
    # descriptor-bound (~7.7 ms at the nuScenes 300k budget) while the
    # cumsum is a fused bandwidth pass; only the V segment-boundary rows
    # are gathered. Segments are contiguous after the sort, so
    # sum(v) = csum[start(v+1) - 1] - csum[start(v) - 1].
    first_slot = jnp.where(newseg & (seg_id < V) & s_valid, seg_id, V)
    # Center each channel before the prefix sum: the running sum over
    # ~300k all-positive values (KITTI x in [0, 70], raw intensities)
    # reaches magnitudes where one fp32 ulp is ~0.25 in feature units,
    # and each voxel sum is a difference of two such values. Subtracting
    # the per-channel mean of the kept points keeps the prefix-sum
    # magnitude near zero; it is added back after the division.
    n_keep = jnp.maximum(jnp.sum(keep.astype(jnp.float32)), 1.0)
    center = jnp.sum(jnp.where(keep[:, None], s_pts, 0.0),
                     axis=0, dtype=jnp.float32) / n_keep
    centered = jnp.where(keep[:, None],
                         s_pts.astype(jnp.float32) - center[None, :], 0.0)
    csum = jnp.cumsum(centered, axis=0)
    ccnt = jnp.cumsum(keep.astype(jnp.int32))
    # per-voxel start row; empty slots -> P so next_start of the last
    # active voxel is P (slots are dense, ascending with linear id)
    starts = jnp.full((V + 1,), P, jnp.int32).at[first_slot].set(
        iota, mode="drop")
    start_v = starts[:V]
    next_start = jnp.concatenate(
        [starts[1:V], jnp.full((1,), P, jnp.int32)])
    end_row = jnp.clip(next_start - 1, 0, P - 1)
    prev_row = jnp.clip(start_v - 1, 0, P - 1)
    has_prev = start_v > 0
    seg_sum = csum[end_row] - jnp.where(has_prev[:, None],
                                        csum[prev_row], 0.0)
    counts = ccnt[end_row] - jnp.where(has_prev, ccnt[prev_row], 0)
    counts = jnp.where(start_v < P, counts, 0)
    feats = seg_sum / jnp.maximum(counts[:, None], 1) + center[None, :]
    feats = jnp.where(counts[:, None] > 0, feats, 0.0).astype(points.dtype)

    # voxel coords: first point of each kept segment defines them
    lin_per_vox = jnp.zeros((V + 1,), jnp.int32).at[first_slot].set(s_lin)
    lin_per_vox = lin_per_vox[:V]
    cz = lin_per_vox // (H * W)
    cy = (lin_per_vox // W) % H
    cx = lin_per_vox % W
    coords = jnp.stack([cz, cy, cx], axis=-1)
    vmask = counts > 0
    coords = jnp.where(vmask[:, None], coords, -1)
    return feats, coords, vmask


@functools.partial(
    jax.jit,
    static_argnames=("pc_range", "voxel_size", "grid_size", "max_points",
                     "max_voxels"))
def hard_voxelize(points, mask, *, pc_range: Sequence[float],
                  voxel_size: Sequence[float], grid_size: Sequence[int],
                  max_points: int, max_voxels: int):
    """Batched hard voxelization + mean VFE.

    points: (B, P, C) with xyz in the first 3 channels; mask: (B, P).
    Returns feats (B, V, C), coords (B, V, 3) int32 (z,y,x), vmask (B, V).
    """
    fn = functools.partial(
        _voxelize_single, pc_range=tuple(pc_range),
        voxel_size=tuple(voxel_size), grid_size=tuple(grid_size),
        max_points=max_points, max_voxels=max_voxels)
    return jax.vmap(fn)(points, mask)


@functools.partial(
    jax.jit,
    static_argnames=("pc_range", "voxel_size", "grid_size", "max_voxels"))
def dynamic_voxelize(points, mask, *, pc_range, voxel_size, grid_size,
                     max_voxels: int):
    """Dynamic voxelization + mean VFE (no per-voxel point cap).

    reference: dynamic path of uni3detr.py:155-171 with DynamicSimpleVFE
    (segment mean over all points of a voxel; scannet_large config).
    """
    fn = functools.partial(
        _voxelize_single, pc_range=tuple(pc_range),
        voxel_size=tuple(voxel_size), grid_size=tuple(grid_size),
        max_points=0, max_voxels=max_voxels)
    return jax.vmap(fn)(points, mask)


def scatter_to_dense(feats, coords, vmask, grid_size):
    """Scatter per-voxel features into a dense (B, D, H, W, C) volume.

    Equivalent of SparseConvTensor.dense() (sparse_encoder_hd.py:132-134),
    channels-last for TPU layout.
    """
    B, V, C = feats.shape
    D, H, W = grid_size

    def one(f, c, m):
        lin = (c[:, 0] * H + c[:, 1]) * W + c[:, 2]
        lin = jnp.where(m, lin, D * H * W)  # dummy row
        dense = jnp.zeros((D * H * W + 1, C), f.dtype)
        dense = dense.at[lin].set(jnp.where(m[:, None], f, 0.0))
        return dense[:-1].reshape(D, H, W, C)

    return jax.vmap(one)(feats, coords, vmask)
