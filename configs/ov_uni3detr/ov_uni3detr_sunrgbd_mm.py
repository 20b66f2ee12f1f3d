# OV-Uni3DETR on SUN RGB-D, multimodal: point + image branches fused in
# voxel space with train-time random modality dropout; staged init from
# the separately-pretrained pc / rgb runs.
_base_ = ['./ov_uni3detr_sunrgbd_rgb.py']

preset = 'ov_uni3detr_sunrgbd_mm'
model = dict(
    zeroshot_path=None,
)

# staged pretrained loading (reference ov_uni3detr_sunrgbd_mm.py:38-41):
# branch params imported by module-path prefix via train.checkpoint
# load_branch
pretrained_img = None  # e.g. work_dirs/ov_uni3detr_sunrgbd_rgb/latest
pretrained_pts = None  # e.g. work_dirs/ov_uni3detr_sunrgbd_pc/latest
load_img = ['img_backbone', 'img_neck', 'view_trans', 'input_proj',
            'depth_net']
load_pts = ['pts_middle_encoder', 'pts_backbone', 'pts_neck']

# per-module lr multipliers (reference paramwise_cfg :297-306)
lr_mult = {
    'img_backbone': 0.1, 'img_neck': 0.1, 'view_trans': 0.1,
    'input_proj': 0.1, 'depth_net': 0.1, 'pts_middle_encoder': 0.1,
    'pts_backbone': 0.1, 'pts_neck': 0.1,
}

data = dict(samples_per_gpu=4)
