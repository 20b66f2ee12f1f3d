from .boxes import (
    encode_boxes,
    decode_boxes,
    gravity_center_boxes,
    bottom_center_boxes,
    corners_bev,
    inverse_sigmoid,
)
from .iou import (
    iou_bev_rotated,
    iou3d_rotated,
    iou3d_rotated_aligned,
    nearest_bev_iou,
    nearest_bev_iou_aligned,
    axis_aligned_iou3d,
    z_interval_iou_aligned,
    rdiou,
)
