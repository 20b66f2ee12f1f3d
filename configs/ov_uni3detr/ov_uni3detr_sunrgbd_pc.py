# OV-Uni3DETR on SUN RGB-D, point-cloud-only branch: 46-class
# open-vocabulary detection with a CLIP text-embedding classifier.
_base_ = ['../_base_/default_runtime.py']

preset = 'ov_uni3detr_sunrgbd_pc'
model = dict(
    # path to the (num_classes, 1024) CLIP text embedding .npy; random
    # normalized embeddings are used when unset (shape parity only)
    zeroshot_path=None,
)

class_names = (
    'chair', 'table', 'pillow', 'sofa_chair', 'desk', 'bed', 'sofa',
    'computer', 'box', 'lamp', 'garbage_bin', 'cabinet', 'shelf', 'drawer',
    'sink', 'night_stand', 'kitchen_counter', 'paper', 'end_table',
    'kitchen_cabinet', 'picture', 'book', 'stool', 'coffee_table',
    'bookshelf', 'painting', 'key_board', 'dresser', 'tv', 'whiteboard',
    'cpu', 'toilet', 'file_cabinet', 'bench', 'ottoman', 'plant', 'monitor',
    'printer', 'recycle_bin', 'door', 'fridge', 'towel', 'cup', 'mirror',
    'laptop', 'cloth')

seen_classes = ('chair', 'table', 'pillow', 'sofa_chair', 'desk', 'bed',
                'sofa', 'computer', 'lamp', 'box')

data = dict(
    dataset_type='sunrgbd',
    data_root='data/sunrgbd/',
    ann_train='sunrgbd_infos_train.pkl',
    ann_val='sunrgbd_infos_val.pkl',
    samples_per_gpu=8,
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
