"""Farthest point sampling (D-FPS) on device.

The reference uses the mmcv CUDA ``furthest_point_sample`` +
``gather_points`` pair, run twice per sample on raw xyz and on voxel
coordinates (uni3detr.py:178-189). Here it is a `lax.fori_loop` over the
sample count with an (N,)-wide min-distance update per step — O(N * S)
VPU work, fully jittable and vmappable over the batch (the reference loops
per batch element on host instead).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _fps_single(xyz, mask, num_samples):
    """xyz (N, 3), mask (N,) -> indices (S,) int32.

    Matches mmcv semantics: starts from index 0; padded/invalid points are
    never selected (once valid points are exhausted the argmax falls back
    to already-selected valid points, i.e. duplicates).
    """
    N = xyz.shape[0]
    xyz = xyz.astype(jnp.float32)
    big = jnp.float32(1e10)
    mindist = jnp.where(mask, big, -1.0)

    def body(i, state):
        mindist, idx = state
        last = idx[i - 1]
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        mindist = jnp.where(mask, jnp.minimum(mindist, d), -1.0)
        nxt = jnp.argmax(mindist).astype(jnp.int32)
        idx = idx.at[i].set(nxt)
        return mindist, idx

    idx0 = jnp.zeros((num_samples,), jnp.int32)
    _, idx = jax.lax.fori_loop(1, num_samples, body, (mindist, idx0))
    return idx


@functools.partial(jax.jit, static_argnames=("num_samples",))
def farthest_point_sample(xyz, mask, num_samples: int):
    """Batched D-FPS: xyz (B, N, 3), mask (B, N) -> (B, S) indices."""
    return jax.vmap(functools.partial(_fps_single, num_samples=num_samples))(
        xyz, mask)
