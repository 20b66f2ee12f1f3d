from .voxelize import hard_voxelize, dynamic_voxelize, scatter_to_dense
from .fps import farthest_point_sample
from .sample import grid_sample_3d, grid_sample_2d
from .nms import nms_bev_rotated, nms3d, soft_nms3d
from .matching import auction_lap, match_queries_to_gt
