from .mesh import (
    make_mesh, shard_batch, replicate, constrain, set_active_mesh,
    DATA_AXIS, SPATIAL_AXIS,
)
