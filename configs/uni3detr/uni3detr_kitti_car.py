# Uni3DETR on KITTI (car class): 9 decoder layers, one-to-many matching
# (gt_repeattimes=5), box-merging post-processing.
_base_ = ['../_base_/default_runtime.py']

preset = 'uni3detr_kitti_car'
model = dict()

class_names = ('Car',)

data = dict(
    dataset_type='kitti',
    data_root='data/kitti/',
    ann_train='kitti_infos_train.pkl',
    ann_val='kitti_infos_val.pkl',
    samples_per_gpu=1,
    box_type_3d='LiDAR',
    load_dim=4,
    use_dim=(0, 1, 2, 3),
    train_pipeline=[
        dict(type='ObjectSample',
             db_info_path='kitti_dbinfos_train.pkl',
             rate=1.0,
             sample_groups=dict(Car=15),
             min_points=dict(Car=5),
             difficulty=(-1,)),
        dict(type='ObjectNoise', num_try=100,
             translation_std=(1.0, 1.0, 0.5),
             global_rot_range=(0.0, 0.0), rot_range=(-0.785398, 0.785398)),
        dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5),
        dict(type='GlobalRotScaleTrans', rot_range=(-0.785398, 0.785398),
             scale_ratio_range=(0.95, 1.05)),
        dict(type='PointsRangeFilter'),
        dict(type='ObjectRangeFilter'),
        dict(type='PointShuffle'),
        dict(type='PointSample', num_points=18000),
    ],
    test_pipeline=[
        dict(type='PointsRangeFilter'),
        dict(type='PointSample', num_points=18000),
    ],
)

optimizer = dict(type='adamw', lr=2e-5 * 3 / 8 * 18 / 2, weight_decay=0.01,
                 clip_norm=10.0)
lr_config = dict(policy='step', step=[32, 38])
total_epochs = 40
