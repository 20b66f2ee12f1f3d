# Synthetic CONVERGENCE config (VERDICT r3 #6): unlike the *_tiny smoke
# configs (sub-voxel boxes, heavy augs — converge to ~0.18 mAP by
# design), this config matches the measure-tool overfit harness
# (tools/measure_ov_overfit.py geometry: boxes >= 2 voxels per side,
# points clustered inside boxes, no augmentation, a tiny fixed dataset)
# so `uni3detr-train` -> `uni3detr-test --eval bbox` reaches >= 0.9
# mAP@0.25 — proving the CLI path TRAINS, not just smoke-runs.
#
# ~6 min on the 1-core CPU host:
#   env UNI3DETR_PLATFORM=cpu python -m uni3detr_tpu.cli.train \
#       configs/uni3detr/uni3detr_synthetic_overfit.py --work-dir WD
#   env UNI3DETR_PLATFORM=cpu python -m uni3detr_tpu.cli.test \
#       configs/uni3detr/uni3detr_synthetic_overfit.py WD/latest --eval bbox
_base_ = ['../_base_/default_runtime.py']

preset = 'uni3detr_tiny_synthetic'
model = dict()

class_names = ('a', 'b', 'c')

data = dict(
    dataset_type='synthetic',
    length=2,
    n_points=1024,
    # voxel_size=(0.125, 0.125, 0.25) -> every side >= 2 voxels
    box_size_m=(0.4, 0.9),
    samples_per_gpu=2,
    workers_per_gpu=1,
    # deterministic: no random transforms, same 2 scenes every epoch
    train_pipeline=[
        dict(type='PointsRangeFilter'),
        dict(type='PointSample', num_points=2048),
    ],
    test_pipeline=[
        dict(type='PointsRangeFilter'),
        dict(type='PointSample', num_points=2048),
    ],
)

optimizer = dict(type='adamw', lr=2e-3, weight_decay=0.01, clip_norm=10.0)
# 1 step per epoch (length 2 / bs 2): epochs == train steps
lr_config = dict(policy='step', step=[450])
total_epochs = 600
checkpoint_config = dict(interval=600)
log_config = dict(interval=100)
evaluation = dict(interval=0)
