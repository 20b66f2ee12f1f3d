# Tiny synthetic OV (multimodal) smoke config: procedural lidar +
# a procedural pinhole camera, tiny OV model. Drives the full OV path
# (ResNet+FPN lift, modality dropout, fusion, CLIP head) end-to-end via
# the CLIs without data on disk.
_base_ = ['../_base_/default_runtime.py']

preset = 'ov_uni3detr_tiny_synthetic'
model = dict()

class_names = ('a', 'b', 'c')

data = dict(
    dataset_type='synthetic',
    length=16,
    n_points=1024,
    with_camera=True,
    img_size=(32, 32),
    samples_per_gpu=2,
    workers_per_gpu=2,
    train_pipeline=[
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
evaluation = dict(interval=2, max_samples=4)
