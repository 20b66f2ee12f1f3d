# Uni3DETR on nuScenes: 10 classes, 10-sweep clouds, velocity code,
# 900 queries, CBGS class-balanced resampling, cyclic schedule.
_base_ = ['../_base_/default_runtime.py']

preset = 'uni3detr_nuscenes'
model = dict()

class_names = ('car', 'truck', 'construction_vehicle', 'bus', 'trailer',
               'barrier', 'motorcycle', 'bicycle', 'pedestrian',
               'traffic_cone')

data = dict(
    dataset_type='nuscenes',
    data_root='data/nuscenes/',
    ann_train='nuscenes_infos_train.pkl',
    ann_val='nuscenes_infos_val.pkl',
    samples_per_gpu=4,
    box_type_3d='LiDAR',
    load_dim=5,
    use_dim=(0, 1, 2, 3, 4),
    sweeps_num=10,
    cbgs=True,
    train_pipeline=[
        dict(type='LoadPointsFromMultiSweeps', sweeps_num=10),
        dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5,
             flip_ratio_bev_vertical=0.5),
        dict(type='GlobalRotScaleTrans', rot_range=(-0.3925, 0.3925),
             scale_ratio_range=(0.95, 1.05)),
        dict(type='PointsRangeFilter'),
        dict(type='ObjectRangeFilter'),
        dict(type='PointShuffle'),
        dict(type='PointSample', num_points=300000),
    ],
    test_pipeline=[
        dict(type='LoadPointsFromMultiSweeps', sweeps_num=10),
        dict(type='PointsRangeFilter'),
        dict(type='PointSample', num_points=300000),
    ],
)

optimizer = dict(type='adamw', lr=2e-5, weight_decay=0.01, clip_norm=10.0)
lr_config = dict(policy='cyclic', target_ratio=(10, 1e-4),
                 step_ratio_up=0.4)
# reference uni3detr_nuscenes.py momentum_config: beta1 cycles inversely
# to the lr (mmcv CyclicMomentumUpdater)
momentum_config = dict(policy='cyclic', target_ratio=(0.85 / 0.95, 1),
                       step_ratio_up=0.4)
total_epochs = 20
