"""Uni3DETR detector: voxelize -> sparse encoder -> SECOND3D+FPN ->
grouped DETR head.

Capability parity with the reference detector (uni3detr.py:113-357):
hard/dynamic voxelization paths (":147-171"), dual FPS query points over
raw xyz and over voxel coordinates reordered (z,y,x)->(x,y,z), both
min-max normalized per sample (":178-189"), then the head.

TPU-first deltas: the whole forward is one jitted program over padded
static shapes (the reference loops FPS per sample on host and runs
Hungarian on CPU); FPS/voxelization are the fused device kernels from
``ops``.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.voxelize import hard_voxelize, dynamic_voxelize
from ..ops.fps import (farthest_point_sample,
                       farthest_point_sample_pair)
from ..parallel.mesh import constrain, DATA_AXIS, SPATIAL_AXIS
from .config import Uni3DETRConfig
from .head import Uni3DETRHead
from .second3d import SECOND3D, SECOND3DFPN
from .sparse_encoder import SparseEncoderHD


def _minmax_norm(pts):
    """Per-sample min-max normalize to [0, 1] (uni3detr.py:18-46,181)."""
    mn = jnp.min(pts, axis=1, keepdims=True)
    mx = jnp.max(pts, axis=1, keepdims=True)
    return (pts - mn) / jnp.maximum(mx - mn, 1e-6)


class Uni3DETR(nn.Module):
    cfg: Uni3DETRConfig

    def voxelize(self, points, mask, train: bool):
        cfg = self.cfg
        budget = cfg.max_voxels if train else cfg.max_voxels_test
        if cfg.dynamic_voxelization:
            return dynamic_voxelize(
                points, mask, pc_range=tuple(cfg.pc_range),
                voxel_size=tuple(cfg.voxel_size),
                grid_size=tuple(cfg.grid_size), max_voxels=budget)
        return hard_voxelize(
            points, mask, pc_range=tuple(cfg.pc_range),
            voxel_size=tuple(cfg.voxel_size), grid_size=tuple(cfg.grid_size),
            max_points=cfg.max_points_per_voxel, max_voxels=budget)

    @nn.compact
    def __call__(self, points, pts_mask, train: bool = False,
                 random_points=None):
        """points (B, P, C) xyz-first; pts_mask (B, P).

        Returns the head's per-layer output stacks.
        """
        cfg = self.cfg
        dtype = cfg.jnp_compute_dtype
        feats, coords, vmask = self.voxelize(points, pts_mask, train)

        volume, grid = SparseEncoderHD(
            sparse_shape=tuple(cfg.grid_size),
            base_channels=cfg.encoder_base_channels,
            output_channels=cfg.encoder_out_channels,
            encoder_channels=cfg.encoder_channels,
            downsample_paddings=cfg.encoder_downsample_paddings,
            budget_shrink=cfg.encoder_budget_shrink,
            budget_caps=cfg.encoder_budget_caps,
            compute_dtype=dtype, impl=cfg.encoder_impl,
            name="pts_middle_encoder")(feats, coords, vmask, train)

        # dense path: batch over 'data', H axis over 'spatial' (XLA halo-
        # exchanges the convs; no-op without an active mesh)
        vol_spec = (DATA_AXIS, None, SPATIAL_AXIS, None, None)
        volume = constrain(volume, vol_spec)
        ms = SECOND3D(out_channels=cfg.backbone_channels,
                      layer_nums=cfg.backbone_layers,
                      layer_strides=cfg.backbone_strides,
                      name="pts_backbone")(volume.astype(dtype), train)
        ms = tuple(constrain(m, vol_spec) for m in ms)
        fused = SECOND3DFPN(out_channels=cfg.neck_channels,
                            upsample_strides=cfg.neck_upsample_strides,
                            name="pts_neck")(ms, train)
        fused = constrain(fused, vol_spec)

        nq = cfg.num_query
        xyz = points[..., :3]
        # voxel-coordinate FPS: (z, y, x) ints -> (x, y, z) floats; both
        # samples run in ONE interleaved kernel (each alone is
        # latency-bound — see _fps_pair_kernel)
        vc = coords[..., ::-1].astype(jnp.float32)
        vc = jnp.where(vmask[..., None], vc, 0.0)
        idx1, idx2 = farthest_point_sample_pair(xyz, pts_mask, vc,
                                                vmask, nq)
        fps1 = jnp.take_along_axis(xyz, idx1[..., None], axis=1)
        fps1 = _minmax_norm(fps1)
        fps2 = jnp.take_along_axis(vc, idx2[..., None], axis=1)
        fps2 = _minmax_norm(fps2)
        fpsbpts = jnp.concatenate([fps1, fps2], axis=1)

        head = Uni3DETRHead(
            num_classes=cfg.num_classes, num_query=nq,
            code_size=cfg.code_size, embed_dim=cfg.embed_dim,
            num_decoder_layers=cfg.num_decoder_layers,
            num_heads=cfg.num_heads, ffn_dim=cfg.ffn_dim,
            dropout=cfg.dropout, pc_range=tuple(cfg.pc_range),
            name="pts_bbox_head")
        return head(fused.astype(dtype), fpsbpts, train=train,
                    random_points=random_points)
