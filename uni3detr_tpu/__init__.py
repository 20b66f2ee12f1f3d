"""uni3detr_tpu — a TPU-native 3D detection framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of Uni3DETR / OV-Uni3DETR
(reference: zhenyuw16/Uni3DETR, a CUDA/mmdetection3d plugin) as a standalone
TPU-first framework:

- ``geom``     — box codes, rotated IoU / RDIoU geometry (pure JAX)
- ``ops``      — voxelization, sparse conv, FPS, trilinear sampling, NMS,
                 Hungarian matching (XLA/Pallas, static shapes)
- ``models``   — flax modules: sparse encoder, SECOND3D backbone/FPN,
                 DETR-style decoder with mixed queries, detection heads
- ``train``    — losses, set-matching targets, jitted train/eval steps
- ``data``     — host-side dataset pipeline (numpy) + evaluation metrics
- ``parallel`` — mesh/sharding utilities (GSPMD data + spatial parallelism)
- ``config``   — python-file config system mirroring the reference API
"""

__version__ = "0.1.0"
