"""Dense 3D backbone + FPN over the voxel volume (XLA-native convs).

Capability parity with the reference SECOND3D (second_3d.py:11-114) and
SECOND3DFPN (second3d_fpn.py:11-143): three parallel (non-cascaded) stages
of (1,3,3) convs striding only H/W, per-stage deconv upsample back to the
common resolution, SUM fusion, then extra 3x3x3 convs. Layout here is
channels-last (B, D, H, W, C) — the TPU-friendly layout — and convs are
``lax.conv_general_dilated`` via flax, which XLA maps straight onto the
MXU.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class _ConvBNReLU(nn.Module):
    features: int
    kernel: Sequence[int] = (1, 3, 3)
    strides: Sequence[int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x, train: bool):
        dt = x.dtype
        pad = [((k - 1) // 2, (k - 1) // 2) for k in self.kernel]
        x = nn.Conv(self.features, self.kernel, strides=tuple(self.strides),
                    padding=pad, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32)(x)
        # BN stats stay f32; restore the compute dtype so the NEXT conv
        # runs on the bf16 MXU path (the f32 upcast leaking through the
        # whole backbone measured ~2x on the dense conv stages)
        return nn.relu(x).astype(dt)


class SECOND3D(nn.Module):
    """reference config: in 256, out [128,256,512], layers [5,5,5],
    strides [1,2,4], is_cascade=False (uni3detr_sunrgbd.py:42-50)."""
    out_channels: Sequence[int] = (128, 256, 512)
    layer_nums: Sequence[int] = (5, 5, 5)
    layer_strides: Sequence[int] = (1, 2, 4)
    is_cascade: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        inp = x
        for i, n in enumerate(self.layer_nums):
            s = self.layer_strides[i]
            y = _ConvBNReLU(self.out_channels[i], strides=(1, s, s),
                            name=f"stage{i}_conv0")(
                                inp if not self.is_cascade else x, train)
            for j in range(n):
                y = _ConvBNReLU(self.out_channels[i],
                                name=f"stage{i}_conv{j+1}")(y, train)
            outs.append(y)
            if self.is_cascade:
                x = y
        return tuple(outs)


class SECOND3DFPN(nn.Module):
    """reference config: in [128,256,512] -> 256 each, upsample [1,2,4],
    sum-fusion, extra_conv 3x (3,3,3) (uni3detr_sunrgbd.py:51-59)."""
    out_channels: Sequence[int] = (256, 256, 256)
    upsample_strides: Sequence[int] = (1, 2, 4)
    use_conv_for_no_stride: bool = True
    num_extra_conv: int = 3

    @nn.compact
    def __call__(self, feats, train: bool = False):
        ups = []
        for i, x in enumerate(feats):
            s = self.upsample_strides[i]
            if s > 1:
                y = nn.ConvTranspose(
                    self.out_channels[i], (1, s, s), strides=(1, s, s),
                    padding="VALID", use_bias=False,
                    name=f"deblock{i}_deconv")(x)
            else:
                y = nn.Conv(self.out_channels[i], (1, 1, 1),
                            use_bias=False, name=f"deblock{i}_conv")(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=jnp.float32,
                             name=f"deblock{i}_bn")(y)
            ups.append(nn.relu(y).astype(x.dtype))
        out = sum(ups) if len(ups) > 1 else ups[0]
        for j in range(self.num_extra_conv):
            out = _ConvBNReLU(self.out_channels[-1], kernel=(3, 3, 3),
                              name=f"extra{j}")(out, train)
        return out
