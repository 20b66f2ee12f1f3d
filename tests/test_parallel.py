"""Multi-device (8 virtual CPU) sharding tests."""
import sys
import pathlib

import jax
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def test_dryrun_multichip_8():
    assert len(jax.devices()) == 8
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_mesh_helpers():
    from uni3detr_tpu.parallel.mesh import make_mesh, shard_batch
    mesh = make_mesh(8, spatial=2)
    assert mesh.shape["data"] == 4 and mesh.shape["spatial"] == 2
    batch = {"x": np.zeros((8, 4), np.float32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.is_fully_replicated is False
