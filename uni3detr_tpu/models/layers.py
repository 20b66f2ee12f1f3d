"""Common flax building blocks (masked batch norm, MLPs)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over a masked voxel list (B, V, C).

    The reference normalizes sparse features with BN1d over active voxels
    only (spconv convention, norm_cfg BN1d eps=1e-3 momentum=0.01 at
    sparse_encoder_hd.py:40). Statistics here are computed over valid
    entries of the (possibly padded) list; under a sharded batch the global
    jit computes cross-device statistics automatically (the reference uses
    per-GPU stats — per-device stats would need shard_map; global stats are
    strictly more correct).
    """
    momentum: float = 0.99  # torch momentum 0.01 == flax momentum 0.99
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, train: bool):
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        red = tuple(range(x.ndim - 1))
        if train:
            m = mask[..., None].astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            xf = x.astype(jnp.float32)
            mean = jnp.sum(xf * m, axis=red) / cnt
            var = jnp.sum(((xf - mean) ** 2) * m, axis=red) / cnt
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return (y * mask[..., None]).astype(x.dtype)


class MLP(nn.Module):
    """Plain ReLU MLP: Linear-ReLU x (n-1) + Linear (reference MLP at
    uni3detr_transformer.py:18-30)."""
    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim)(x))
        return nn.Dense(self.output_dim)(x)


class BranchMLP(nn.Module):
    """Head branch: num_fcs x (Linear [+LN] + ReLU) + Linear(out).

    reference Uni3DETRHead._init_layers (uni3detr_head.py:365-387): the cls
    branch inserts LayerNorm between Linear and ReLU; reg/iou don't.
    """
    output_dim: int
    num_fcs: int = 2
    layer_norm: bool = False
    final_bias_init: float | None = None

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        for _ in range(self.num_fcs):
            x = nn.Dense(d)(x)
            if self.layer_norm:
                x = nn.LayerNorm(epsilon=1e-5)(x)
            x = nn.relu(x)
        bias_init = (nn.initializers.constant(self.final_bias_init)
                     if self.final_bias_init is not None
                     else nn.initializers.zeros_init())
        return nn.Dense(self.output_dim, bias_init=bias_init)(x)


def sine_pos_embed(pos, num_feats: int = 128, temperature: float = 10000.0):
    """Sine embedding of (..., n) positions -> (..., n * num_feats).

    reference get_sine_pos_embed (uni3detr_transformer.py:33-65): scale 2*pi,
    per-coordinate interleaved [sin(x/t0), cos(x/t1), ...] with
    t_i = temperature^(2*(i//2)/num_feats).
    """
    import numpy as np
    scale = 2 * np.pi
    dim_t = temperature ** (
        2 * (jnp.arange(num_feats, dtype=jnp.float32) // 2) / num_feats)
    x = pos[..., None] * scale / dim_t  # (..., n, num_feats)
    sin = jnp.sin(x[..., 0::2])
    cos = jnp.cos(x[..., 1::2])
    out = jnp.stack([sin, cos], axis=-1).reshape(*x.shape[:-1], num_feats)
    return out.reshape(*pos.shape[:-1], pos.shape[-1] * num_feats)
