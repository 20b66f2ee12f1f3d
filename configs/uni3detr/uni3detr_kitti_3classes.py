# Uni3DETR on KITTI (Car / Pedestrian / Cyclist), per-class score
# thresholds at post-processing.
_base_ = ['./uni3detr_kitti_car.py']

preset = 'uni3detr_kitti_3classes'

class_names = ('Pedestrian', 'Cyclist', 'Car')

data = dict(
    train_pipeline=[
        dict(type='ObjectSample',
             db_info_path='kitti_dbinfos_train.pkl',
             rate=1.0,
             sample_groups=dict(Car=12, Pedestrian=10, Cyclist=10),
             min_points=dict(Car=5, Pedestrian=5, Cyclist=5),
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
)
