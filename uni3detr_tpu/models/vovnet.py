"""VoVNet(-CP) image backbone (OSA modules + eSE attention).

Capability parity with the reference VoVNet (models/backbones/vovnet.py:
268-374, OSA modules with effective-SE ":165-178"). Registered upstream
but unused by every shipped config (they use ResNet50+DCN) — provided for
inventory completeness with the V2-39 layout by default.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        dt = x.dtype
        x = nn.Conv(self.features, (self.kernel,) * 2,
                    strides=(self.strides,) * 2, padding="SAME",
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32)(x)
        # stats in f32; keep the conv chain on the compute dtype
        return nn.relu(x).astype(dt)


class _eSE(nn.Module):
    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Dense(C)(g)
        return x * jax.nn.hard_sigmoid(g)


class _OSA(nn.Module):
    stage_ch: int
    concat_ch: int
    layers_per_block: int = 5
    identity: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        outs = [x]
        y = x
        for i in range(self.layers_per_block):
            y = _ConvBNReLU(self.stage_ch, name=f"conv{i}")(y, train)
            outs.append(y)
        y = jnp.concatenate(outs, axis=-1)
        y = _ConvBNReLU(self.concat_ch, kernel=1, name="concat")(y, train)
        y = _eSE(name="ese")(y)
        if self.identity and identity.shape[-1] == y.shape[-1]:
            y = y + identity
        return y


class VoVNet(nn.Module):
    """V2-39 layout: stem 64/64/128, stages (128,256,512,768)->(256,512,
    768,1024), blocks per stage (1,1,2,2)."""
    stage_ch: Sequence[int] = (128, 160, 192, 224)
    concat_ch: Sequence[int] = (256, 512, 768, 1024)
    blocks: Sequence[int] = (1, 1, 2, 2)
    out_indices: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvBNReLU(64, strides=2, name="stem1")(x, train)
        x = _ConvBNReLU(64, name="stem2")(x, train)
        x = _ConvBNReLU(128, strides=2, name="stem3")(x, train)
        outs = []
        for i in range(4):
            if i > 0:
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=[(1, 1), (1, 1)])
            for j in range(self.blocks[i]):
                x = _OSA(self.stage_ch[i], self.concat_ch[i],
                         identity=(j > 0), name=f"stage{i+2}_osa{j}")(
                             x, train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
