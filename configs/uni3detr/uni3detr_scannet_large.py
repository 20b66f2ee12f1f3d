# Uni3DETR on ScanNet — large variant: dynamic voxelization (no point or
# voxel caps in the reference; static budgets here), wider encoder.
_base_ = ['./uni3detr_scannet.py']

preset = 'uni3detr_scannet_large'
