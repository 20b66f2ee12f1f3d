"""Tiny shared model config + synthetic scene generator for tests."""
import numpy as np

from uni3detr_tpu.models.config import Uni3DETRConfig

TINY = Uni3DETRConfig(
    num_classes=3,
    code_size=8,
    pc_range=(-2.0, -2.0, -1.0, 2.0, 2.0, 1.0),
    voxel_size=(0.125, 0.125, 0.25),
    grid_size=(8, 32, 32),
    max_points_per_voxel=4,
    max_voxels=256,
    in_point_features=3,
    encoder_base_channels=8,
    encoder_out_channels=32,
    encoder_channels=((8, 8, 8), (8, 8, 16), (16, 16, 16), (16, 16)),
    encoder_downsample_paddings=((1, 1, 1), (1, 1, 1), (1, 1, 1)),
    backbone_channels=(16, 16, 16),
    backbone_layers=(1, 1, 1),
    backbone_strides=(1, 2, 4),
    neck_channels=(32, 32, 32),
    neck_upsample_strides=(1, 2, 4),
    num_query=24,
    embed_dim=32,
    num_decoder_layers=2,
    num_heads=4,
    ffn_dim=64,
    dropout=0.0,
    post_center_range=(-2.0, -2.0, -1.0, 2.0, 2.0, 1.0),
    max_num=32,
)


def synth_scene(rng, n_boxes=4, n_points=512, cfg=TINY):
    """Random boxes + points clustered inside them.

    Returns (points (P,3), gt_boxes storage layout (G,7), labels (G,)).
    """
    lo = np.array(cfg.pc_range[:3])
    hi = np.array(cfg.pc_range[3:])
    boxes, labels = [], []
    for _ in range(n_boxes):
        size = rng.uniform(0.4, 1.0, 3)
        ctr = rng.uniform(lo + size, hi - size)
        yaw = rng.uniform(-np.pi, np.pi)
        boxes.append([ctr[0], ctr[1], ctr[2] - size[2] / 2,
                      size[0], size[1], size[2], yaw])
        labels.append(rng.randint(cfg.num_classes))
    boxes = np.asarray(boxes, np.float32)
    labels = np.asarray(labels, np.int32)
    pts = []
    per = n_points // (n_boxes + 1)
    for b in boxes:
        local = rng.uniform(-0.5, 0.5, (per, 3)) * b[3:6]
        c, s = np.cos(b[6]), np.sin(b[6])
        x = local[:, 0] * c - local[:, 1] * s + b[0]
        y = local[:, 0] * s + local[:, 1] * c + b[1]
        z = local[:, 2] + b[2] + b[5] / 2
        pts.append(np.stack([x, y, z], -1))
    pts.append(rng.uniform(lo, hi, (n_points - per * n_boxes, 3)))
    points = np.concatenate(pts).astype(np.float32)
    return points, boxes, labels


def pad_batch(scenes, P=512, G=8):
    """List of (points, boxes, labels) -> padded arrays + masks."""
    B = len(scenes)
    pts = np.zeros((B, P, 3), np.float32)
    pmask = np.zeros((B, P), bool)
    boxes = np.zeros((B, G, 7), np.float32)
    labels = np.zeros((B, G), np.int32)
    gmask = np.zeros((B, G), bool)
    for i, (p, b, l) in enumerate(scenes):
        n = min(len(p), P)
        pts[i, :n] = p[:n]
        pmask[i, :n] = True
        g = min(len(b), G)
        boxes[i, :g] = b[:g]
        labels[i, :g] = l[:g]
        gmask[i, :g] = True
    return pts, pmask, boxes, labels, gmask
