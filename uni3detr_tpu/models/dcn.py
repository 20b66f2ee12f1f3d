"""Deformable convolution v2 as bilinear gather + matmul (TPU-native).

The reference's image backbone uses mmcv's DCNv2 CUDA op in ResNet stages
2-4 (ov_uni3detr_sunrgbd_mm.py:51-53). On TPU the modulated deformable
conv is expressed directly as its definition: a regular conv predicts
per-position offsets and modulation masks; the input is bilinearly sampled
at the offset taps (the ``grid_sample_2d`` kernel) and contracted with the
weights on the MXU — no im2col atomics needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sample import grid_sample_2d


class DeformConv2dV2(nn.Module):
    features: int
    kernel_size: int = 3
    strides: int = 1
    deform_groups: int = 1  # 1 supported (reference uses 1)

    @nn.compact
    def __call__(self, x):
        """x (B, H, W, C) -> (B, H', W', features)."""
        B, H, W, C = x.shape
        k = self.kernel_size
        s = self.strides
        # offset/mask conv initialized to zero => starts as a plain conv
        # explicit torch-style symmetric padding (mmcv conv_offset uses
        # Conv2d(padding=(k-1)//2); flax "SAME" pads (0,1) at stride 2)
        pad = (k - 1) // 2
        om = nn.Conv(3 * k * k, (k, k), strides=(s, s),
                     padding=[(pad, pad), (pad, pad)],
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, name="offset_conv")(x)
        Ho, Wo = om.shape[1], om.shape[2]
        off = om[..., :2 * k * k].reshape(B, Ho, Wo, k * k, 2)
        mask = jax.nn.sigmoid(om[..., 2 * k * k:]).reshape(B, Ho, Wo, k * k)

        # base tap locations (pixel coords in the input)
        ys = jnp.arange(Ho, dtype=jnp.float32) * s
        xs = jnp.arange(Wo, dtype=jnp.float32) * s
        dy, dx = jnp.meshgrid(
            jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2,
            jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2, indexing="ij")
        base_y = ys[:, None, None] + dy.ravel()[None, None, :]  # (Ho,1,KK)
        base_x = xs[None, :, None] + dx.ravel()[None, None, :]  # (1,Wo,KK)
        py = base_y + off[..., 0]  # (B, Ho, Wo, KK) with broadcasting
        px = base_x + off[..., 1]
        # to [-1, 1] grid coords (align_corners=False convention)
        gx = (px * 2 + 1) / W - 1
        gy = (py * 2 + 1) / H - 1
        grid = jnp.stack([gx, gy], -1).reshape(B, Ho * Wo * k * k, 2)
        taps = grid_sample_2d(x, grid).reshape(B, Ho, Wo, k * k, C)
        taps = taps * mask[..., None]
        w = self.param("kernel", nn.initializers.variance_scaling(
            1.0, "fan_in", "normal"), (k * k, C, self.features))
        return jax.lax.dot_general(
            taps.reshape(B, Ho, Wo, k * k * C),
            w.reshape(k * k * C, self.features),
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
