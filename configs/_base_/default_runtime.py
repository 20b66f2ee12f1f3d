# Default runtime settings (logging / checkpointing / eval cadence),
# mirroring the role of the reference's mmdet3d default_runtime base.
checkpoint_config = dict(interval=1)  # epochs between checkpoints
log_config = dict(interval=50)        # steps between log lines
evaluation = dict(interval=5)         # epochs between eval runs
seed = 0
work_dir = None  # defaults to ./work_dirs/<config-name>
resume_from = None
load_from = None
