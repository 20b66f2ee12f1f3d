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
    subm_neighbor_idx, gather_conv, downsample_sites_auto,
    strided_neighbor_idx, strided_inverse_neighbor_idx,
    build_position_table, linear_ids, subm_query_ids, strided_query_ids,
    strided_inverse_query_ids,
)
from ..ops.voxelize import scatter_to_dense
from .layers import MaskedBatchNorm


class _SpConv(nn.Module):
    """One sparse conv. Three executions of the same (K, Cin, Cout)
    kernel:

    - ID-MATCHING Pallas conv (``idpack`` given): neighbors found by
      matching query linear ids against the sorted site-id list inside
      the kernel's window walk — NO rulebook and NO position table exist
      on this path (the table scatter + 27-per-site scalar lookups
      measured ~53 ms/scene at SUN RGB-D eval budgets, more than the
      rest of the encoder);
    - gather-GEMM over the active-voxel list (``neighbor_idx`` given) —
      positions precomputed via the dense table (CPU, and TPU stages too
      big for the id kernel's VMEM budget, which use the lane-packed
      positional kernel);
    - masked dense conv over the scattered volume (both None) —
      numerically identical at active sites because inactive cells hold
      zero features; runs as a regular MXU 3D convolution. The param
      tree is shared, so checkpoints are interchangeable across impls.
    """
    out_channels: int
    kernel_volume: int = 27

    @nn.compact
    def __call__(self, x, neighbor_idx=None, stride: int = 1,
                 padding=(1, 1, 1), bwd_idx=None, bwd_flip: bool = True,
                 idpack=None):
        """``bwd_idx``/``bwd_flip``: transposed-conv rulebook for the
        Pallas backward — defaults to the (symmetric) submanifold rule;
        strided callers pass the inverse rulebook with bwd_flip=False.
        ``idpack``: (site_ids, qids, bwd_qids, bwd_ids) for the
        id-matching path."""
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (self.kernel_volume, cin, self.out_channels))
        if idpack is not None:
            from ..ops.sparse_conv_pallas import gather_conv_ids
            site_ids, qids, bwd_qids, bwd_ids = idpack
            return gather_conv_ids(x, site_ids, qids, w, bwd_qids,
                                   bwd_ids, bwd_flip)
        if neighbor_idx is not None:
            from ..ops.sparse_conv_pallas import (gather_conv_pallas,
                                                 pallas_fits)
            if (jax.default_backend() not in ("cpu",)
                    and pallas_fits(x.shape[1], cin)):
                if bwd_idx is None:
                    bwd_idx = neighbor_idx
                return gather_conv_pallas(x, neighbor_idx, w, bwd_idx,
                                          bwd_flip)
            return jax.vmap(gather_conv, in_axes=(0, 0, None))(
                x, neighbor_idx, w)
        k = round(self.kernel_volume ** (1.0 / 3.0))
        assert k ** 3 == self.kernel_volume
        # (K, Cin, Cout) -> (kz, ky, kx, Cin, Cout): _kernel_offsets is
        # row-major over (z, y, x), matching DHWIO directly
        wk = w.reshape(k, k, k, cin, self.out_channels).astype(x.dtype)
        out = jax.lax.conv_general_dilated(
            x, wk, window_strides=(stride,) * 3,
            padding=[(p, p) for p in padding],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        return out.astype(x.dtype)


class _SpConvBNReLU(nn.Module):
    out_channels: int
    kernel_volume: int = 27

    @nn.compact
    def __call__(self, feats, neighbor_idx, mask, train: bool,
                 idpack=None):
        x = _SpConv(self.out_channels, self.kernel_volume)(
            feats, neighbor_idx, idpack=idpack)
        x = MaskedBatchNorm()(x, mask, train)
        return nn.relu(x)


class _BasicBlock(nn.Module):
    """Residual submanifold block (SparseBasicBlock semantics)."""
    channels: int

    @nn.compact
    def __call__(self, feats, neighbor_idx, mask, train: bool,
                 idpack=None):
        identity = feats
        x = _SpConv(self.channels)(feats, neighbor_idx, idpack=idpack)
        x = MaskedBatchNorm()(x, mask, train)
        x = nn.relu(x)
        x = _SpConv(self.channels)(x, neighbor_idx, idpack=idpack)
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
    # voxel budget after each of the three downsamples:
    # budget_i = min(ceil(V * budget_shrink[i]), budget_caps[i]);
    # per-preset values come from measured surface-scan occupancy
    # (tools/measure_stage_occupancy.py; Uni3DETRConfig docstring)
    budget_shrink: Sequence[float] = (1.0, 0.5, 0.25)
    budget_caps: Sequence[int] | None = None
    compute_dtype: jnp.dtype = jnp.float32
    # 'gather': gather-GEMM over the voxel list (low-occupancy outdoor
    # grids); 'dense': masked dense convs over the scattered volume
    # (indoor grids — see _SpConv docstring for the measured tradeoff)
    impl: str = "gather"

    @nn.compact
    def __call__(self, feats, coords, vmask, train: bool = False):
        """feats (B, V, C), coords (B, V, 3) int32 (z,y,x) sorted by linear
        id with invalid rows trailing, vmask (B, V).

        Returns (volume (B, D', H', W', Cout), out_grid).
        """
        if self.impl == "dense":
            return self._dense_forward(feats, coords, vmask, train)
        from ..ops.sparse_conv_pallas import (idmatch_fits,
                                              match_positions)
        B, V, _ = feats.shape
        grid = tuple(self.sparse_shape)
        x = feats.astype(self.compute_dtype)
        on_tpu = jax.default_backend() not in ("cpu",)

        def site_ctx(c, m, g, budget, n_convs):
            """Per-site-set lookup context, measured dispatch
            (tools/profile_idmatch_stage1.py, TPU v5e):
            - TPU, >= 3 submanifold convs share the site set (every
              shipped stage: 2 SparseBasicBlocks = 4 convs, +conv_input
              on stage 1): ONE Pallas position MATCHER builds a classic
              rulebook by matching query linear ids against the sorted
              site-id list (ids-only VMEM — fits at ANY stage size;
              26.6 ms incl. id build at V=120k vs 40.3 for the XLA
              position-table pipeline), then every conv of the stage
              runs on the positional packed kernel (10.1 ms/conv vs
              25.5 for the lane-packed id conv at 120k; 2.6 vs 5.2 at
              40k) — no dense position table anywhere;
            - TPU, <= 2 convs on the set and the id feature table fits
              VMEM: rulebook-FREE id-matching convs (the matcher call
              doesn't amortize);
            - CPU: dense position table + XLA gather-GEMM."""
            if on_tpu:
                ids = jax.vmap(linear_ids, in_axes=(0, 0, None))(c, m, g)
                qids = jax.vmap(subm_query_ids,
                                in_axes=(0, 0, None))(c, m, g)
                if idmatch_fits(budget) and n_convs <= 2:
                    return {"ids": ids, "qids": qids,
                            "subm_pack": (ids, qids, qids, ids)}
                return {"ids": ids, "nb": match_positions(ids, qids,
                                                          budget)}
            table = jax.vmap(build_position_table,
                             in_axes=(0, 0, None))(c, m, g)
            nb = jax.vmap(subm_neighbor_idx,
                          in_axes=(0, 0, None, None, 0))(c, m, g, 3,
                                                         table)
            return {"table": table, "nb": nb}

        def subm(mod, x, ctx, m):
            if "subm_pack" in ctx:
                return mod(x, None, m, train, idpack=ctx["subm_pack"])
            return mod(x, ctx["nb"], m, train)

        n_stages = len(self.encoder_channels)
        # submanifold convs sharing each stage's site set: 2 per
        # SparseBasicBlock, +1 for conv_input on stage 1
        n_subm = [2 * len(blocks[:-1] if i < n_stages - 1 else blocks)
                  for i, blocks in enumerate(self.encoder_channels)]
        n_subm[0] += 1
        ctx = site_ctx(coords, vmask, grid, V, n_subm[0])
        x = subm(_SpConvBNReLU(self.base_channels, name="conv_input"),
                 x, ctx, vmask)
        for i, blocks in enumerate(self.encoder_channels):
            last_strided = i < n_stages - 1
            body = blocks[:-1] if last_strided else blocks
            for j, ch in enumerate(body):
                x = subm(_BasicBlock(ch, name=f"stage{i+1}_block{j}"),
                         x, ctx, vmask)
            if last_strided:
                pad = self.downsample_paddings[i]
                budget = -(-int(V * self.budget_shrink[i]) // 8) * 8
                if self.budget_caps is not None:
                    budget = min(budget, self.budget_caps[i])
                budget = max(budget, 256)
                new_coords, new_mask = jax.vmap(
                    lambda c, m: downsample_sites_auto(
                        c, m, grid, pad, budget)[:2])(coords, vmask)
                new_grid = tuple(
                    (g + 2 * p - 3) // 2 + 1 for g, p in zip(grid, pad))
                new_ctx = site_ctx(new_coords, new_mask, new_grid,
                                   budget, n_subm[i + 1])
                conv = _SpConv(blocks[-1], name=f"stage{i+1}_down")
                if "ids" in ctx and "ids" in new_ctx:
                    sq = jax.vmap(strided_query_ids,
                                  in_axes=(0, 0, None, None))(
                        new_coords, new_mask, grid, pad)
                    if train:
                        invq = jax.vmap(strided_inverse_query_ids,
                                        in_axes=(0, 0, None, None))(
                            coords, vmask, new_grid, pad)
                    else:
                        invq = sq  # backward-only; dead at eval
                    if (idmatch_fits(x.shape[1])
                            and idmatch_fits(budget)):
                        # single conv on this rulebook: the id-matching
                        # conv avoids both matcher calls (fwd + train
                        # inverse) outright
                        x = conv(x, None, bwd_flip=False,
                                 idpack=(ctx["ids"], sq, invq,
                                         new_ctx["ids"]))
                    else:
                        # matcher rulebooks + positional kernels (id
                        # feature table above the VMEM budget)
                        sidx = match_positions(ctx["ids"], sq,
                                               x.shape[1])
                        if train:
                            inv_idx = match_positions(new_ctx["ids"],
                                                      invq, budget)
                        else:
                            inv_idx = sidx
                        x = conv(x, sidx, bwd_idx=inv_idx,
                                 bwd_flip=False)
                else:
                    table = ctx.get("table")
                    if table is None:
                        table = jax.vmap(build_position_table,
                                         in_axes=(0, 0, None))(
                            coords, vmask, grid)
                    sidx = jax.vmap(
                        strided_neighbor_idx,
                        in_axes=(0, 0, 0, 0, None, None, None, None, 0))(
                            new_coords, new_mask, coords, vmask, grid,
                            pad, 2, 3, table)
                    if train:
                        inv_idx = jax.vmap(
                            strided_inverse_neighbor_idx,
                            in_axes=(0, 0, 0, 0, None, None, None, None,
                                     0))(
                                coords, vmask, new_coords, new_mask,
                                new_grid, pad, 2, 3,
                                new_ctx.get("table"))
                    else:
                        inv_idx = sidx
                    x = conv(x, sidx, bwd_idx=inv_idx, bwd_flip=False)
                x = MaskedBatchNorm(name=f"stage{i+1}_down_bn")(
                    x, new_mask, train)
                x = nn.relu(x)
                coords, vmask, grid = new_coords, new_mask, new_grid
                ctx = new_ctx

        # conv_out: 1x1x1 SparseConv == per-voxel dense layer
        x = nn.Dense(self.output_channels, use_bias=False,
                     name="conv_out")(x)
        x = MaskedBatchNorm(name="conv_out_bn")(x, vmask, train)
        x = nn.relu(x)
        volume = scatter_to_dense(x, coords, vmask, grid)
        return volume, grid

    def _dense_forward(self, feats, coords, vmask, train: bool):
        """Masked-dense execution: scatter once, then regular 3D convs.

        Identical module/param names as the gather path, so a checkpoint
        trained with either impl loads into the other. Semantics deltas
        (both in dense's favor): no per-stage voxel budget truncation, and
        the strided site set is the exact any-covered-input set
        (maxpool of occupancy) rather than the budget-capped one.
        """
        from ..parallel.mesh import constrain, DATA_AXIS, SPATIAL_AXIS
        grid = tuple(self.sparse_shape)
        x = scatter_to_dense(feats.astype(self.compute_dtype), coords,
                             vmask, grid)
        occ = scatter_to_dense(
            vmask[..., None].astype(jnp.float32), coords, vmask,
            grid)[..., 0] > 0
        spec = (DATA_AXIS, None, SPATIAL_AXIS, None, None)
        x = constrain(x, spec)
        x = _SpConvBNReLU(self.base_channels, name="conv_input")(
            x, None, occ, train)
        n_stages = len(self.encoder_channels)
        for i, blocks in enumerate(self.encoder_channels):
            last_strided = i < n_stages - 1
            body = blocks[:-1] if last_strided else blocks
            for j, ch in enumerate(body):
                x = _BasicBlock(ch, name=f"stage{i+1}_block{j}")(
                    x, None, occ, train)
            if last_strided:
                pad = self.downsample_paddings[i]
                x = _SpConv(blocks[-1], name=f"stage{i+1}_down")(
                    x, None, stride=2, padding=pad)
                occ = nn.max_pool(
                    occ[..., None].astype(jnp.float32), (3, 3, 3),
                    strides=(2, 2, 2),
                    padding=[(p, p) for p in pad])[..., 0] > 0
                x = MaskedBatchNorm(name=f"stage{i+1}_down_bn")(
                    x, occ, train)
                x = nn.relu(x)
                x = constrain(x, spec)
        x = nn.Dense(self.output_channels, use_bias=False,
                     name="conv_out")(x)
        x = MaskedBatchNorm(name="conv_out_bn")(x, occ, train)
        x = nn.relu(x)
        return x, tuple(x.shape[1:4])
