"""Device mesh + GSPMD sharding utilities.

The reference's only parallelism is PyTorch-DDP data parallelism over NCCL
(SURVEY.md §2.4). The TPU-native design is a 2-axis mesh:

- ``data``    — batch sharding (DP); gradient/stat collectives ride ICI
  automatically under jit (GSPMD inserts the psums DDP does by hand);
- ``spatial`` — optional sharding of the dense voxel volume's H axis
  (sequence-parallel analog for the 3D grid; XLA partitions the dense
  convs with halo exchange). This is a genuine improvement over the
  reference, whose [41,1600,1408] KITTI grid is its single-GPU memory
  hot spot.

Model code calls :func:`constrain` on big intermediates; it is a no-op
unless a mesh has been activated via :func:`set_active_mesh`, so
single-chip runs compile unchanged.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"

_ACTIVE_MESH: Optional[Mesh] = None


def make_mesh(n_devices: Optional[int] = None, spatial: int = 1,
              devices=None) -> Mesh:
    """(data, spatial) mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % spatial == 0
    grid = devices.reshape(n_devices // spatial, spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def set_active_mesh(mesh: Optional[Mesh]):
    """Activate a mesh for model-internal sharding constraints."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def constrain(x, spec: Sequence[Optional[str]]):
    """with_sharding_constraint against the active mesh (no-op without).

    Axes whose size doesn't divide the mesh axis are left unsharded (e.g.
    a heavily-strided backbone stage on a small grid).
    """
    if _ACTIVE_MESH is None:
        return x
    fixed = tuple(
        ax if (ax is None or dim % _ACTIVE_MESH.shape[ax] == 0) else None
        for dim, ax in zip(x.shape, spec))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_ACTIVE_MESH, P(*fixed)))


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with the leading axis over ``data``."""
    def put(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
