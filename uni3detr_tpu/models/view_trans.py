"""Camera -> voxel-space view transformer (Uni3DViewTrans equivalent).

Capability parity with the reference lift (uni3d_viewtrans.py:10-370):
- a normalized meshgrid over ``voxel_shape`` (X, Y, Z counts) scaled to
  pc_range (":275-277");
- inverse of the accumulated point-cloud augmentation rotation so camera
  rays align with the augmented cloud (":279-282");
- projection through per-camera ``lidar2img`` 4x4 matrices with
  behind-camera / out-of-frustum masking (":301-339");
- bilinear sampling of each FPN level + trilinear sampling of the
  predicted depth distribution (u, v, z_metric/depth_dim) (":342-368");
- output[voxel] = sum over cams/levels of feat * depth_prob * mask,
  reshaped to (B, D, H, W, C) (channels-last here), then num_convs 3D
  conv+BN+ReLU encoding (":53-81,136-172").

All sampling uses the shared grid_sample kernels; per-camera work folds
into the batch axis.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.sample import grid_sample_2d, grid_sample_3d


def make_reference_voxels(voxel_shape, pc_range):
    """(X*Y*Z, 3) world-space voxel centers, x-major like the reference
    meshgrid (uni3d_viewtrans.py:198-202): linspace(0, 1, n) per axis."""
    X, Y, Z = voxel_shape
    gx = jnp.linspace(0.0, 1.0, X)
    gy = jnp.linspace(0.0, 1.0, Y)
    gz = jnp.linspace(0.0, 1.0, Z)
    vx, vy, vz = jnp.meshgrid(gx, gy, gz, indexing="ij")
    ref = jnp.stack([vx, vy, vz], -1).reshape(-1, 3)
    lo = jnp.asarray(pc_range[:3])
    hi = jnp.asarray(pc_range[3:6])
    return ref * (hi - lo) + lo


def sample_camera_features(mlvl_feats, img_depth, ref_voxels, lidar2img,
                           img_shape, img_rot_aug=None, img_trans_aug=None):
    """Lift multi-level camera features into the voxel set.

    mlvl_feats: list of (B, N_cam, Hl, Wl, C); img_depth: (B, N_cam, Hd,
    Wd, DD) softmax depth distribution at the first level's resolution per
    level list or single; ref_voxels (B, V, 3) world coords (already
    inverse-augmented); lidar2img (B, N_cam, 4, 4); img_shape (H, W).
    img_rot_aug (B, 2, 2) / img_trans_aug (B, 2): accumulated image-level
    augmentation (resize/flip/crop) applied to projected pixel coords as
    ``uv @ rot + trans`` before normalization — matching the reference's
    "transfer if have image-level augmentation" block
    (uni3d_viewtrans.py:312-322); img_shape is the post-aug shape.
    Returns (B, V, C).
    """
    B, N = lidar2img.shape[:2]
    V = ref_voxels.shape[1]
    ones = jnp.ones((B, V, 1), ref_voxels.dtype)
    hom = jnp.concatenate([ref_voxels, ones], -1)  # (B, V, 4)
    cam = jnp.einsum("bnij,bvj->bnvi", lidar2img, hom)  # (B, N, V, 4)
    eps = 1e-5
    depth = cam[..., 2:3]
    mask = depth[..., 0] > eps
    uv = cam[..., :2] / jnp.maximum(depth, eps)
    if img_rot_aug is not None:
        uv = jnp.einsum("bnvj,bji->bnvi", uv,
                        img_rot_aug.astype(uv.dtype))
    if img_trans_aug is not None:
        uv = uv + img_trans_aug.astype(uv.dtype)[:, None, None, :]
    H, W = img_shape
    u = uv[..., 0] / W * 2.0 - 1.0
    v = uv[..., 1] / H * 2.0 - 1.0
    if isinstance(img_depth, (list, tuple)):
        depth_dim = img_depth[0].shape[-1]
    else:
        depth_dim = img_depth.shape[-1]
    dz = depth[..., 0] / depth_dim * 2.0 - 1.0
    mask &= (u > -1.0) & (u < 1.0) & (v > -1.0) & (v < 1.0) \
        & (dz > -1.0) & (dz < 1.0)

    grid2d = jnp.stack([u, v], -1).reshape(B * N, V, 2)
    grid3d = jnp.stack([u, v, dz], -1).reshape(B * N, V, 3)

    out = None
    depths = img_depth if isinstance(img_depth, (list, tuple)) \
        else [img_depth]
    for lvl, feat in enumerate(mlvl_feats):
        C = feat.shape[-1]
        f = grid_sample_2d(feat.reshape((B * N,) + feat.shape[2:]), grid2d)
        d = depths[min(lvl, len(depths) - 1)]
        # depth volume (B*N, Hd, Wd, DD) -> treat DD as the D axis of a
        # 3D volume laid out (D=DD? no: trilinear over (x=u, y=v, z=dz))
        dvol = d.reshape((B * N,) + d.shape[2:])  # (BN, Hd, Wd, DD)
        # grid_sample_3d expects (D, H, W, C): put depth bins on D axis
        dvol = jnp.moveaxis(dvol, -1, 1)[..., None]  # (BN, DD, Hd, Wd, 1)
        # coords (x->W=Wd, y->H=Hd, z->D=DD)
        dsamp = grid_sample_3d(dvol, grid3d)  # (BN, V, 1)
        contrib = f * dsamp
        out = contrib if out is None else out + contrib
    out = out.reshape(B, N, V, -1)
    out = out * mask[..., None].astype(out.dtype)
    return out  # (B, N, V, C); callers reduce over the camera axis


class Uni3DViewTrans(nn.Module):
    """Lift + sweep fusion + 3D conv encoding; (B, D, H, W, C) out.

    Multi-sweep camera fusion modes mirror the reference
    (uni3d_viewtrans.py:83-102,136-153): cameras of each sweep sum into a
    per-sweep volume, then ``sweep_fusion`` in {"", "sweep_sum",
    "sweep_cat", "with_time"} combines sweeps (with_time concatenates a
    per-sweep time channel and 1x1-convs back to C).
    """
    voxel_shape: Tuple[int, int, int]  # (X, Y, Z)
    pc_range: Tuple[float, ...]
    embed_dims: int = 256
    num_convs: int = 3
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    num_sweeps: int = 1
    sweep_fusion: str = ""

    @nn.compact
    def __call__(self, mlvl_feats, img_depth, lidar2img, uni_rot_aug,
                 img_shape, train: bool = False, sweep_times=None,
                 img_rot_aug=None, img_trans_aug=None):
        """uni_rot_aug (B, 3, 3): accumulated point-aug rotation; the
        voxel grid is pulled back through its inverse before projection.
        img_rot_aug (B, 2, 2) / img_trans_aug (B, 2): accumulated
        image-level aug mapping original pixel coords into the augmented
        image (uni3d_viewtrans.py:312-322).
        With num_sweeps S > 1, the camera axis of the inputs is laid out
        (S * num_cams); sweep_times (B, S) feeds the with_time mode."""
        B = lidar2img.shape[0]
        X, Y, Z = self.voxel_shape
        ref = make_reference_voxels(self.voxel_shape, self.pc_range)
        ref = jnp.broadcast_to(ref, (B,) + ref.shape)
        # row-vector convention like the reference: ref @ inv(R)
        # (uni3d_viewtrans.py:281)
        inv = jnp.linalg.inv(uni_rot_aug.astype(jnp.float32))
        ref = jnp.einsum("bvj,bji->bvi", ref, inv)
        per_cam = sample_camera_features(mlvl_feats, img_depth, ref,
                                         lidar2img, img_shape,
                                         img_rot_aug, img_trans_aug)
        C = per_cam.shape[-1]
        V = per_cam.shape[2]
        S = self.num_sweeps
        feats = per_cam.reshape(B, S, -1, V, C).sum(axis=2)  # (B, S, V, C)
        if S > 1 and "with_time" in self.sweep_fusion:
            t = sweep_times if sweep_times is not None \
                else jnp.zeros((B, S), feats.dtype)
            t = jnp.broadcast_to(t[:, :, None, None], (B, S, V, 1))
            feats = jnp.concatenate([feats, t.astype(feats.dtype)], -1)
            feats = nn.relu(nn.Dense(self.embed_dims,
                                     name="time_conv")(feats))
        if S > 1 and "sweep_cat" in self.sweep_fusion:
            feats = feats.transpose(0, 2, 1, 3).reshape(B, V, S * C)
            feats = nn.relu(nn.Dense(self.embed_dims,
                                     name="trans_conv")(feats))
        else:
            feats = feats.sum(axis=1)  # sweep_sum / single sweep
        # (B, V=X*Y*Z, C) x-major -> (B, Z, Y, X, C) = (B, D, H, W, C)
        vol = feats.reshape(B, X, Y, Z, -1).transpose(0, 3, 2, 1, 4)
        for k in range(self.num_convs):
            pad = [((s - 1) // 2, (s - 1) // 2) for s in self.kernel_size]
            dt = vol.dtype
            vol = nn.Conv(self.embed_dims, self.kernel_size, padding=pad,
                          name=f"conv_trans{k+1}")(vol)
            vol = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                               epsilon=1e-3, dtype=jnp.float32,
                               name=f"bn{k+1}")(vol)
            vol = nn.relu(vol).astype(dt)  # BN stats f32, convs bf16
        return vol
