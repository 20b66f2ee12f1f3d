"""ResNet image backbone + FPN neck (flax, channels-last).

Capability parity with the reference image branch: torchvision-style
ResNet-50 with optional DCNv2 in stages 2-4 and frozen stages
(ov_uni3detr_sunrgbd_mm.py:42-53), plus an mmdet-style FPN with extra
output levels (":54-59"). VoVNet (vovnet.py) is registered upstream but
unused by every shipped config, so ResNet is the supported backbone here.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .dcn import DeformConv2dV2


class _Bottleneck(nn.Module):
    planes: int
    strides: int = 1
    use_dcn: bool = False
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        # BN stats in f32, output restored to the compute dtype so the
        # following convs stay on the bf16 MXU path
        bn = lambda name: (
            lambda v, _m=nn.BatchNorm(use_running_average=not train,
                                      momentum=0.9, epsilon=1e-5,
                                      dtype=jnp.float32, name=name):
            _m(v).astype(v.dtype))
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        if self.use_dcn:
            y = DeformConv2dV2(self.planes, 3, self.strides, name="conv2")(y)
        else:
            # explicit (1,1) padding: torch Conv2d(padding=1, stride=2)
            # pads symmetrically; flax "SAME" pads (0,1) at stride 2,
            # shifting the tap grid by one pixel vs the reference
            y = nn.Conv(self.planes, (3, 3), strides=(self.strides,) * 2,
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = bn("bn3")(y)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               name="ds_conv")(x)
            identity = bn("ds_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """depth-50 layout (3, 4, 6, 3); returns 4 stage feature maps.

    ``frozen_stages`` matches torchvision/mmdet ``_freeze_stages``: with
    value k >= 0 the stem and stages 1..k run with eval-mode BatchNorm and
    a stop_gradient on their output, so their params receive zero grads
    and their running stats never update (the OV configs train with
    frozen_stages=1, ov_uni3detr_sunrgbd_mm.py). stop_gradient alone
    leaves AdamW weight decay active on those leaves — pair with
    ``frozen_param_prefixes`` in the optimizer (train/step.py) for exact
    requires_grad=False semantics.
    """
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    stage_with_dcn: Sequence[bool] = (False, True, True, True)
    frozen_stages: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        dt = x.dtype
        stem_train = train and self.frozen_stages < 0
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="stem_conv")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not stem_train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=jnp.float32,
                                 name="stem_bn")(x)).astype(dt)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        outs = []
        planes = 64
        for i, n in enumerate(self.stage_blocks):
            frozen = (i + 1) <= self.frozen_stages
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                x = _Bottleneck(
                    planes, strides=stride, use_dcn=self.stage_with_dcn[i],
                    downsample=(j == 0), name=f"layer{i+1}_{j}")(
                        x, train and not frozen)
            if frozen:
                x = jax.lax.stop_gradient(x)
            outs.append(x)
            planes *= 2
        return tuple(outs)

    @staticmethod
    def frozen_param_prefixes(frozen_stages: int,
                              scope: str = "img_backbone"):
        """Param-path prefixes covered by ``frozen_stages`` (for the
        optimizer's zero-update mask)."""
        if frozen_stages < 0:
            return ()
        out = [f"{scope}/stem_conv", f"{scope}/stem_bn"]
        out += [f"{scope}/layer{i+1}_" for i in range(frozen_stages)]
        return tuple(out)


class FPN(nn.Module):
    """mmdet FPN: lateral 1x1 + top-down upsample-add + 3x3 output convs.

    Extra output levels follow mmdet's default ``add_extra_convs=False``
    (the OV configs set nothing, ov_uni3detr_sunrgbd_mm.py:54-58): a
    parameter-free stride-2 subsample of the last output (mmdet FPN uses
    ``F.max_pool2d(outs[-1], 1, stride=2)`` — kernel 1, so it IS a
    subsample). ``extra_convs=True`` keeps the previous stride-2 conv
    behavior for configs that want it."""
    out_channels: int = 256
    num_outs: int = 5
    extra_convs: bool = False

    @nn.compact
    def __call__(self, feats: Tuple):
        laterals = [nn.Conv(self.out_channels, (1, 1),
                            name=f"lateral{i}")(f)
                    for i, f in enumerate(feats)]
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(laterals[i], laterals[i - 1].shape,
                                  "nearest")
            laterals[i - 1] = laterals[i - 1] + up
        outs = [nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        name=f"fpn_conv{i}")(l)
                for i, l in enumerate(laterals)]
        while len(outs) < self.num_outs:
            if self.extra_convs:
                outs.append(nn.Conv(self.out_channels, (3, 3),
                                    strides=(2, 2), padding="SAME",
                                    name=f"fpn_extra{len(outs)}")(outs[-1]))
            else:
                outs.append(outs[-1][:, ::2, ::2, :])
        return tuple(outs)
