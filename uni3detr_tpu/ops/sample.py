"""Trilinear / bilinear grid sampling matching torch ``F.grid_sample``
semantics (align_corners=False, zero padding).

The reference's decoder cross-attention samples the fused voxel volume at
query reference points via CUDA grid_sample (uni3detr_transformer.py:345),
and the camera->voxel lift samples FPN maps + depth volumes the same way
(uni3d_viewtrans.py:342-368). Here sampling is expressed as 8-corner (or
4-corner) gathers + lerp in jnp; XLA fuses the weighting into the gathers.

Coordinate convention: grid values in [-1, 1] with the LAST axis ordered
(x, y[, z]) mapping to (W, H[, D]) — identical to torch. Unnormalization
(align_corners=False): pix = ((g + 1) * size - 1) / 2.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(g, size):
    return ((g + 1.0) * size - 1.0) * 0.5


def grid_sample_3d(volume, coords):
    """volume (..., D, H, W, C); coords (..., N, 3) in [-1,1] as (x,y,z).

    Returns (..., N, C). Leading batch dims must match between volume and
    coords (broadcasting is not applied across them).
    """
    def single(vol, pts):
        D, H, W, C = vol.shape
        x = _unnormalize(pts[:, 0], W)
        y = _unnormalize(pts[:, 1], H)
        z = _unnormalize(pts[:, 2], D)
        x0 = jnp.floor(x); y0 = jnp.floor(y); z0 = jnp.floor(z)
        fx = x - x0; fy = y - y0; fz = z - z0
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)
        z0 = z0.astype(jnp.int32)

        flat = vol.reshape(D * H * W, C)

        def corner(dz, dy, dx):
            xi = x0 + dx; yi = y0 + dy; zi = z0 + dz
            ok = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
                  & (zi >= 0) & (zi < D))
            lin = (jnp.clip(zi, 0, D - 1) * H + jnp.clip(yi, 0, H - 1)) * W \
                + jnp.clip(xi, 0, W - 1)
            wx = jnp.where(dx == 1, fx, 1.0 - fx)
            wy = jnp.where(dy == 1, fy, 1.0 - fy)
            wz = jnp.where(dz == 1, fz, 1.0 - fz)
            w = (wx * wy * wz) * ok.astype(vol.dtype)
            return flat[lin] * w[:, None]

        out = None
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    c = corner(dz, dy, dx)
                    out = c if out is None else out + c
        return out

    batch_shape = volume.shape[:-4]
    vol_flat = volume.reshape((-1,) + volume.shape[-4:])
    pts_flat = coords.reshape((-1,) + coords.shape[-2:])
    out = jax.vmap(single)(vol_flat, pts_flat.astype(volume.dtype))
    return out.reshape(batch_shape + out.shape[1:])


def grid_sample_2d(image, coords):
    """image (..., H, W, C); coords (..., N, 2) in [-1,1] as (x,y).

    Returns (..., N, C). torch F.grid_sample bilinear, align_corners=False,
    zero padding.
    """
    def single(img, pts):
        H, W, C = img.shape
        x = _unnormalize(pts[:, 0], W)
        y = _unnormalize(pts[:, 1], H)
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        fx = x - x0; fy = y - y0
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)
        flat = img.reshape(H * W, C)

        def corner(dy, dx):
            xi = x0 + dx; yi = y0 + dy
            ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            lin = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            wx = jnp.where(dx == 1, fx, 1.0 - fx)
            wy = jnp.where(dy == 1, fy, 1.0 - fy)
            w = (wx * wy) * ok.astype(img.dtype)
            return flat[lin] * w[:, None]

        return (corner(0, 0) + corner(0, 1) + corner(1, 0) + corner(1, 1))

    batch_shape = image.shape[:-3]
    img_flat = image.reshape((-1,) + image.shape[-3:])
    pts_flat = coords.reshape((-1,) + coords.shape[-2:])
    out = jax.vmap(single)(img_flat, pts_flat.astype(image.dtype))
    return out.reshape(batch_shape + out.shape[1:])
