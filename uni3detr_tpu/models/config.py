"""Model hyperparameter dataclass shared by detector / train step / coder."""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Uni3DETRConfig:
    # task
    num_classes: int = 10
    code_size: int = 8
    # geometry
    pc_range: Tuple[float, ...] = (-3.2, -0.2, -2.0, 3.2, 6.2, 0.56)
    voxel_size: Tuple[float, ...] = (0.02, 0.02, 0.02)
    grid_size: Tuple[int, int, int] = (128, 320, 320)  # (D, H, W)
    # voxelization budgets (static shapes); reference max_voxels is a
    # (train, test) pair (uni3detr_sunrgbd.py:29)
    max_points_per_voxel: int = 5
    max_voxels: int = 16000
    max_voxels_test: int = 40000
    num_points: int = 100000  # PointSample cap -> host padding budget
    max_gt: int = 48          # GT padding budget (per sample)
    dynamic_voxelization: bool = False
    in_point_features: int = 4
    # encoder execution: 'gather' (gather-GEMM over the voxel list) or
    # 'dense' (masked dense convs on the scattered volume) — numerically
    # identical at active sites, chosen per grid occupancy
    # (models/sparse_encoder.py _SpConv docstring has the measurements)
    encoder_impl: str = "gather"
    # encoder
    encoder_base_channels: int = 16
    encoder_out_channels: int = 256
    encoder_channels: Tuple[Tuple[int, ...], ...] = (
        (16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
    encoder_downsample_paddings: Tuple[Tuple[int, int, int], ...] = (
        (1, 1, 1), (1, 1, 1), (0, 1, 1))
    # Static per-stage site budgets after each strided downsample:
    # budget_i = min(ceil(V * shrink_i), caps_i) where V is the input
    # voxel budget. The reference (spconv) materializes exact site
    # sets; these paddings are sized from measured occupancy of
    # surface-like scans (tools/measure_stage_occupancy.py) — too small
    # silently truncates sites (ascending linear-id prefix), too large
    # pays padded conv/matcher work. Fractions handle caps that scale
    # with V (train 16k vs eval 40k input budgets see the same scene),
    # absolute caps handle presets whose scene content is fixed while V
    # varies (KITTI expands ~1.9x of its 16k train budget but only
    # ~0.75x of its 40k eval budget).
    encoder_budget_shrink: Tuple[float, float, float] = (1.0, 0.5, 0.25)
    encoder_budget_caps: Optional[Tuple[int, int, int]] = None
    # backbone / neck
    backbone_channels: Tuple[int, ...] = (128, 256, 512)
    backbone_layers: Tuple[int, ...] = (5, 5, 5)
    backbone_strides: Tuple[int, ...] = (1, 2, 4)
    neck_channels: Tuple[int, ...] = (256, 256, 256)
    neck_upsample_strides: Tuple[int, ...] = (1, 2, 4)
    # head
    num_query: int = 300
    embed_dim: int = 256
    num_decoder_layers: int = 3
    num_heads: int = 8
    ffn_dim: int = 512
    dropout: float = 0.1
    gt_repeattimes: int = 1
    # training / matching
    sync_cls_avg_factor: bool = True
    cls_cost_weight: float = 2.0
    reg_cost_weight: float = 0.25
    iou_cost_weight: float = 1.2
    # which registered match cost fills the IoU slot
    # (hungarian_assigner_3d.py:110-121 builds it from cfg; the registry
    # offers IoU3DCost / RotatedIoU3DCost / AxisAlignedIoU3DCost / RDIoUCost,
    # match_cost.py:35-102)
    iou_cost_type: str = "iou3d"  # iou3d|rotated_iou3d|axis_aligned_iou3d|rdiou
    # classification cost: FocalLossCost (default) or the registered
    # IoU-modulated SoftFocalLossCost (match_cost.py:101-128, registered
    # but unused by shipped reference configs)
    cls_cost_type: str = "focal"  # focal | soft_focal
    # which registered loss fills the head's loss_iou slot
    # (uni3detr_head.py:356 build_loss; IoU3DLoss in every shipped config,
    # RotatedIoU3DLoss the declared default :331, RDIoULoss registered in
    # rdiouloss.py:35-91)
    iou_loss_type: str = "iou3d"  # iou3d | rotated_iou3d | rdiou
    loss_cls_weight: float = 1.5
    loss_bbox_weight: float = 0.25
    loss_iou_weight: float = 1.2
    # assignment solver: 'auction' (on-device, default) or 'scipy'
    # (host round-trip, bit-exact — the reference's own strategy,
    # hungarian_assigner_3d.py:123-139). matcher_phases sets the
    # auction's epsilon: eps = cost_spread / 8**matcher_phases
    # (None = spread/2048; gap bound is n_gt * eps — see
    # ops/matching.py::auction_lap and tools/measure_matcher.py)
    matcher: str = "auction"
    matcher_phases: int | None = None
    code_weights: Tuple[float, ...] = (1.0,) * 8
    # decode / post-processing (NMSFreeCoder + head post_processing)
    post_center_range: Tuple[float, ...] = (-3.2, -0.2, -2.0, 3.2, 6.2, 0.56)
    max_num: int = 1000
    coder_alpha: float = 1.0
    post_processing: str = "nms"  # nms | soft_nms | box_merging | none
    nms_thr: float = 0.5
    soft_nms_sigma: float = 0.3
    soft_nms_prune: float = 1e-2
    score_thr: float | Tuple[float, ...] | None = None
    num_thr: int | None = None
    # compute
    compute_dtype: str = "float32"

    @property
    def jnp_compute_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" \
            else jnp.float32


@dataclasses.dataclass(frozen=True)
class OVUni3DETRConfig(Uni3DETRConfig):
    """OV-Uni3DETR: multimodal open-vocabulary extension
    (ov_uni3detr.py:23-443 + ov_uni3detr_sunrgbd_*.py configs)."""
    use_lidar: bool = True
    use_camera: bool = True
    multimodal: bool = True
    num_cams: int = 1
    num_sweeps: int = 1  # camera sweeps; image axis laid out (S * cams)
    sweep_fusion: str = "sweep_sum"  # sweep_sum | sweep_cat | with_time
    img_size: Tuple[int, int] = (480, 640)  # (H, W) padded input
    depth_dim: int = 64
    num_view_convs: int = 3
    view_kernel: Tuple[int, int, int] = (3, 3, 3)
    fpn_levels: int = 4
    stage_with_dcn: Tuple[bool, ...] = (False, True, True, True)
    frozen_stages: int = 1
    use_grid_mask: bool = True
    clip_dim: int = 1024
    zeroshot_path: Optional[str] = None
    uncertainty_consistency_weight: float = 1.0
