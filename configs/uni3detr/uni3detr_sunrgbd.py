# Uni3DETR on SUN RGB-D (10 indoor classes).
# Mirrors the reference experiment projects/configs/uni3detr/
# uni3detr_sunrgbd.py via the built-in preset; fields under `model`
# override Uni3DETRConfig dataclass fields directly.
_base_ = ['../_base_/default_runtime.py']

preset = 'uni3detr_sunrgbd'
model = dict()

class_names = ('bed', 'table', 'sofa', 'chair', 'toilet', 'desk', 'dresser',
               'night_stand', 'bookshelf', 'bathtub')

data = dict(
    dataset_type='sunrgbd',
    data_root='data/sunrgbd/',
    ann_train='sunrgbd_infos_train.pkl',
    ann_val='sunrgbd_infos_val.pkl',
    samples_per_gpu=4,
    repeat=2,
    box_type_3d='Depth',
    load_dim=6,
    use_dim=(0, 1, 2),
    shift_height=True,
    train_pipeline=[
        dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5),
        dict(type='GlobalRotScaleTrans', rot_range=(-0.523599, 0.523599),
             scale_ratio_range=(0.85, 1.15), shift_height=True),
        dict(type='PointsRangeFilter'),
        dict(type='PointSample', num_points=100000),
    ],
    test_pipeline=[
        dict(type='PointsRangeFilter'),
        dict(type='PointSample', num_points=100000),
    ],
)

optimizer = dict(type='adamw', lr=2e-5 * 2 / 8 * 20, weight_decay=0.01,
                 clip_norm=10.0)
lr_config = dict(policy='step', step=[32, 38])
total_epochs = 40
