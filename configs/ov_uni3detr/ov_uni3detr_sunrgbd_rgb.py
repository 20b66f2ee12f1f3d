# OV-Uni3DETR on SUN RGB-D, camera-only branch: ResNet50(+DCNv2)+FPN ->
# SimpleDepth -> voxel lift -> 6-layer decoder, CLIP classifier.
_base_ = ['./ov_uni3detr_sunrgbd_pc.py']

preset = 'ov_uni3detr_sunrgbd_rgb'
model = dict(
    zeroshot_path=None,
    use_grid_mask=True,
)

data = dict(
    samples_per_gpu=2,
    use_camera=True,
    train_pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='PhotoMetricDistortion'),
        dict(type='NormalizeImage'),
        dict(type='PadImage', size=(480, 640)),
        dict(type='GridMask', prob=0.7),
        dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5),
        dict(type='GlobalRotScaleTrans', rot_range=(-0.523599, 0.523599),
             scale_ratio_range=(0.85, 1.15), shift_height=True),
        dict(type='PointsRangeFilter'),
        dict(type='PointSample', num_points=100000),
    ],
    test_pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='NormalizeImage'),
        dict(type='PadImage', size=(480, 640)),
        dict(type='PointsRangeFilter'),
        dict(type='PointSample', num_points=100000),
    ],
)
