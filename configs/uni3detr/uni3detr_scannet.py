# Uni3DETR on ScanNet (18 classes).
_base_ = ['./uni3detr_sunrgbd.py']

preset = 'uni3detr_scannet'

class_names = ('cabinet', 'bed', 'chair', 'sofa', 'table', 'door', 'window',
               'bookshelf', 'picture', 'counter', 'desk', 'curtain',
               'refrigerator', 'showercurtrain', 'toilet', 'sink', 'bathtub',
               'garbagebin')

data = dict(
    dataset_type='scannet',
    data_root='data/scannet/',
    ann_train='scannet_infos_train.pkl',
    ann_val='scannet_infos_val.pkl',
    train_pipeline=[
        dict(type='GlobalAlignment', rotation_axis=2),
        dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5,
             flip_ratio_bev_vertical=0.5),
        dict(type='GlobalRotScaleTrans', rot_range=(-0.087266, 0.087266),
             scale_ratio_range=(0.9, 1.1)),
        dict(type='PointsRangeFilter'),
        dict(type='PointSample', num_points=200000),
    ],
    test_pipeline=[
        dict(type='GlobalAlignment', rotation_axis=2),
        dict(type='PointsRangeFilter'),
        dict(type='PointSample', num_points=200000),
    ],
)
