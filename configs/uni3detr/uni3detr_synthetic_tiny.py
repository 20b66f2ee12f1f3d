# Tiny synthetic smoke config: procedural scenes, tiny model. Used by CI
# and for quick sanity runs on any backend.
_base_ = ['../_base_/default_runtime.py']

preset = 'uni3detr_tiny_synthetic'
model = dict()

class_names = ('a', 'b', 'c')

data = dict(
    dataset_type='synthetic',
    length=16,
    n_points=1024,
    samples_per_gpu=2,
    workers_per_gpu=2,
    train_pipeline=[
        dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5),
        dict(type='GlobalRotScaleTrans', rot_range=(-0.3, 0.3),
             scale_ratio_range=(0.95, 1.05)),
        dict(type='PointsRangeFilter'),
        dict(type='PointSample', num_points=2048),
    ],
    test_pipeline=[
        dict(type='PointsRangeFilter'),
        dict(type='PointSample', num_points=2048),
    ],
)

optimizer = dict(type='adamw', lr=1e-3, weight_decay=0.01, clip_norm=10.0)
lr_config = dict(policy='step', step=[8])
total_epochs = 2
log_config = dict(interval=2)
# EvalHook (reference `evaluation = dict(interval=...)`)
evaluation = dict(interval=2, max_samples=4)
# TTA grid for `cli.test --tta` (MultiRotScaleFlipAug3D equivalent)
tta = dict(rot_degrees=(0.0,), scales=(1.0,), flips=(False, True))
