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

Multi-host: :func:`init_distributed` wraps ``jax.distributed.initialize``
(the reference's ``init_dist('pytorch', backend='nccl')``,
extra_tools/train.py:157 + dist_train.sh:8); after it, ``jax.devices()``
spans every process and the same mesh/jit code runs unchanged — batches
are assembled from per-process local shards with :func:`global_batch`,
and host-side results are gathered with :func:`gather_objects`
(the reference's ``multi_gpu_test --gpu_collect`` / mmcv
``collect_results_cpu``, extra_tools/test.py:221-222).
"""
from __future__ import annotations

import os
import pickle
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
    """Device-put a pytree fully replicated over the mesh (multi-process
    safe: every process holds the same host values, e.g. params
    initialized from the same seed)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


# ---------------------------------------------------------------------------
# multi-host (reference: torch.distributed.launch + NCCL, SURVEY.md §2.4)
# ---------------------------------------------------------------------------

def init_distributed(coordinator: str, num_processes: int,
                     process_id: int) -> None:
    """``jax.distributed.initialize`` wrapper. Must run before any other
    JAX call touches a backend. After it, ``jax.devices()`` is the global
    device list and one GSPMD mesh spans the pod slice; collectives ride
    ICI within a slice and DCN across (XLA picks the transport)."""
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_slice(n: int) -> slice:
    """This process's contiguous slice of a length-``n`` global batch
    axis (``global_batch`` concatenates per-process shards in
    process-index order)."""
    per = n // jax.process_count()
    assert per * jax.process_count() == n, \
        f"global batch {n} must divide process count {jax.process_count()}"
    return slice(jax.process_index() * per,
                 (jax.process_index() + 1) * per)


def global_batch(batch, mesh: Mesh):
    """Assemble globally-sharded device arrays from per-process LOCAL
    batches (leading axis over ``data``). Single-process: plain
    shard_batch."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)

    def put(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x))
    return jax.tree_util.tree_map(put, batch)


def to_host(tree):
    """Local numpy copy of a (replicated) global-array pytree — for
    checkpoint writes on the main process."""
    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)
    return jax.tree_util.tree_map(get, tree)


def barrier(name: str = "barrier") -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def gather_objects(obj, tmpdir: Optional[str] = None,
                   name: str = "gather"):
    """All-gather arbitrary picklable host objects across processes.
    Returns the list [obj_0, ..., obj_{P-1}] on process 0, None
    elsewhere (the reference's dist-eval gather,
    extra_tools/test.py:221-222).

    Default transport is a device collective on pickled bytes (mmcv
    ``collect_results_gpu`` semantics) — it needs NO shared filesystem,
    so it works on multi-host pods whose ``/tmp``/work_dir are
    host-local. Set ``UNI3DETR_GATHER=file`` to use the shared-directory
    protocol instead (mmcv ``collect_results_cpu``; requires ``tmpdir``
    to be on storage visible to every process — useful when results are
    too large to stage through HBM)."""
    if jax.process_count() == 1:
        return [obj]
    if os.environ.get("UNI3DETR_GATHER", "device") != "file":
        return _gather_objects_device(obj)
    assert tmpdir is not None, \
        "UNI3DETR_GATHER=file needs a shared tmpdir"
    os.makedirs(tmpdir, exist_ok=True)
    pid = jax.process_index()
    path = os.path.join(tmpdir, f"{name}_part_{pid}.pkl")
    with open(path, "wb") as f:
        pickle.dump(obj, f)
    barrier(f"{name}_written")
    if pid != 0:
        barrier(f"{name}_read")
        return None
    out = []
    for i in range(jax.process_count()):
        p = os.path.join(tmpdir, f"{name}_part_{i}.pkl")
        with open(p, "rb") as f:
            out.append(pickle.load(f))
        os.remove(p)
    barrier(f"{name}_read")
    return out


def _gather_objects_device(obj):
    """Collective gather of pickled bytes: per-process payloads are
    zero-padded to the max length, all-gathered as uint8 arrays, and
    unpickled on process 0 (rank order = process-index order)."""
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray(payload.size, np.int64))
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[:payload.size] = payload
    gathered = multihost_utils.process_allgather(buf)
    if jax.process_index() != 0:
        return None
    return [pickle.loads(np.asarray(gathered[i, :int(sizes[i])]).tobytes())
            for i in range(jax.process_count())]
