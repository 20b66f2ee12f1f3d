"""Depth-preserving sparse middle encoder (TPU gather-GEMM formulation).

Capability parity with the reference ``SparseEncoderHD``
(sparse_encoder_hd.py:14-214): an input submanifold conv, four stages of
residual SparseBasicBlocks with a strided SparseConv3d closing stages 1-3,
a 1x1x1 conv-out, and a final densify that KEEPS the depth axis
(keep_depth=True) producing a (B, D', H', W', C) volume for the decoder.

Architecture differences are deliberate TPU choices, not omissions:
- rulebooks are built with sorted-id binary search (ops/sparse_conv.py),
  shared by every submanifold conv of a stage;
- convs run as (V, K*Cin) @ (K*Cin, Cout) MXU matmuls in bf16;
- BN is a masked batch norm over active voxels with global-batch stats.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sparse_conv import (
    subm_neighbor_idx, gather_conv, downsample_sites, strided_neighbor_idx,
    build_position_table,
)
from ..ops.voxelize import scatter_to_dense
from .layers import MaskedBatchNorm


class _SpConv(nn.Module):
    """One sparse conv (subm or strided share the gather-GEMM form)."""
    out_channels: int
    kernel_volume: int = 27

    @nn.compact
    def __call__(self, feats, neighbor_idx):
        cin = feats.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (self.kernel_volume, cin, self.out_channels))
        return jax.vmap(gather_conv, in_axes=(0, 0, None))(
            feats, neighbor_idx, w)


class _SpConvBNReLU(nn.Module):
    out_channels: int
    kernel_volume: int = 27

    @nn.compact
    def __call__(self, feats, neighbor_idx, mask, train: bool):
        x = _SpConv(self.out_channels, self.kernel_volume)(feats,
                                                           neighbor_idx)
        x = MaskedBatchNorm()(x, mask, train)
        return nn.relu(x)


class _BasicBlock(nn.Module):
    """Residual submanifold block (SparseBasicBlock semantics)."""
    channels: int

    @nn.compact
    def __call__(self, feats, neighbor_idx, mask, train: bool):
        identity = feats
        x = _SpConv(self.channels)(feats, neighbor_idx)
        x = MaskedBatchNorm()(x, mask, train)
        x = nn.relu(x)
        x = _SpConv(self.channels)(x, neighbor_idx)
        x = MaskedBatchNorm()(x, mask, train)
        return nn.relu(x + identity)


class SparseEncoderHD(nn.Module):
    """config-shaped like the reference (uni3detr_sunrgbd.py:32-41)."""
    sparse_shape: Tuple[int, int, int]  # (D, H, W) over (z, y, x)
    base_channels: int = 16
    output_channels: int = 256
    encoder_channels: Sequence[Sequence[int]] = (
        (16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
    # per-stage padding of the closing strided conv (z, y, x); the
    # reference encoder_paddings' last element per stage (subm paddings
    # are irrelevant to site sets)
    downsample_paddings: Sequence[Tuple[int, int, int]] = (
        (1, 1, 1), (1, 1, 1), (0, 1, 1))
    # voxel budget after each of the three downsamples, as a fraction of
    # the input budget
    budget_shrink: Sequence[float] = (1.0, 0.5, 0.25)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, coords, vmask, train: bool = False):
        """feats (B, V, C), coords (B, V, 3) int32 (z,y,x) sorted by linear
        id with invalid rows trailing, vmask (B, V).

        Returns (volume (B, D', H', W', Cout), out_grid).
        """
        B, V, _ = feats.shape
        grid = tuple(self.sparse_shape)
        x = feats.astype(self.compute_dtype)

        # one dense position table per site set, shared by every rulebook
        # of the stage (subm + the closing strided conv)
        table = jax.vmap(build_position_table, in_axes=(0, 0, None))(
            coords, vmask, grid)
        nb = jax.vmap(subm_neighbor_idx, in_axes=(0, 0, None, None, 0))(
            coords, vmask, grid, 3, table)
        x = _SpConvBNReLU(self.base_channels, name="conv_input")(
            x, nb, vmask, train)

        n_stages = len(self.encoder_channels)
        for i, blocks in enumerate(self.encoder_channels):
            last_strided = i < n_stages - 1
            body = blocks[:-1] if last_strided else blocks
            for j, ch in enumerate(body):
                x = _BasicBlock(ch, name=f"stage{i+1}_block{j}")(
                    x, nb, vmask, train)
            if last_strided:
                pad = self.downsample_paddings[i]
                budget = max(int(V * self.budget_shrink[i]), 256)
                new_coords, new_mask = jax.vmap(
                    lambda c, m: downsample_sites(c, m, grid, pad,
                                                  budget)[:2])(coords, vmask)
                new_grid = tuple(
                    (g + 2 * p - 3) // 2 + 1 for g, p in zip(grid, pad))
                sidx = jax.vmap(
                    strided_neighbor_idx,
                    in_axes=(0, 0, 0, 0, None, None, None, None, 0))(
                        new_coords, new_mask, coords, vmask, grid, pad,
                        2, 3, table)
                x = _SpConv(blocks[-1], name=f"stage{i+1}_down")(x, sidx)
                x = MaskedBatchNorm(name=f"stage{i+1}_down_bn")(
                    x, new_mask, train)
                x = nn.relu(x)
                coords, vmask, grid = new_coords, new_mask, new_grid
                table = jax.vmap(
                    build_position_table, in_axes=(0, 0, None))(
                        coords, vmask, grid)
                nb = jax.vmap(
                    subm_neighbor_idx, in_axes=(0, 0, None, None, 0))(
                        coords, vmask, grid, 3, table)

        # conv_out: 1x1x1 SparseConv == per-voxel dense layer
        x = nn.Dense(self.output_channels, use_bias=False,
                     name="conv_out")(x)
        x = MaskedBatchNorm(name="conv_out_bn")(x, vmask, train)
        x = nn.relu(x)
        volume = scatter_to_dense(x, coords, vmask, grid)
        return volume, grid
