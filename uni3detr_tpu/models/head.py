"""Uni3DETR detection head: mixed query groups, per-layer cls/reg/IoU
branches, DETR-style outputs.

Capability parity with the reference Uni3DETRHead
(uni3detr_head.py:311-508):
- learnable content embeddings (2*nq, C) and learnable reference anchors
  (nq, 3) (":409-411");
- query groups: train [learnable | fps_xyz | fps_voxel] = 3*nq; eval adds
  a random-point group = 4*nq (":443-449"); groups share content embedding
  2 and never cross-attend;
- per decoder layer: cls (Linear+LN+ReLU stack), reg (code_size), and a
  decoupled IoU branch (":365-387"), with xy/z added to the running
  reference in logit space, sigmoided and rescaled to pc_range
  (":482-490").

Outputs are the (L, B, Q, .) stacks the loss/coder consume.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..geom.boxes import inverse_sigmoid
from .layers import BranchMLP
from .transformer import Uni3DETRDecoder

_CLS_BIAS_INIT = float(-np.log((1 - 0.01) / 0.01))  # focal-style prior


class Uni3DETRHead(nn.Module):
    num_classes: int
    num_query: int = 300
    code_size: int = 8
    embed_dim: int = 256
    num_decoder_layers: int = 3
    num_heads: int = 8
    ffn_dim: int = 512
    dropout: float = 0.1
    pc_range: Tuple[float, ...] = (-3.2, -0.2, -2.0, 3.2, 6.2, 0.56)

    @nn.compact
    def __call__(self, volume, fpsbpts, train: bool = False,
                 random_points=None):
        """volume (B, D, H, W, C); fpsbpts (B, 2*nq, 3) in [0, 1].

        random_points: (B, nq, 3) uniform [0,1) — required when
        train=False (the extra eval query group).
        Returns dict of stacked per-layer outputs.
        """
        B = fpsbpts.shape[0]
        nq, C = self.num_query, self.embed_dim
        L = self.num_decoder_layers

        tgt_embed = self.param("tgt_embed", nn.initializers.normal(1.0),
                               (2 * nq, C))
        refpoint = self.param("refpoint_embed", nn.initializers.normal(1.0),
                              (nq, 3))

        fps_ref = inverse_sigmoid(fpsbpts).reshape(B, 2, nq, 3)
        learn_ref = jnp.broadcast_to(refpoint, (B, 1, nq, 3))
        shared = jnp.broadcast_to(tgt_embed[nq:], (B, 1, nq, C))
        contents = [jnp.broadcast_to(tgt_embed[:nq], (B, 1, nq, C)),
                    shared, shared]
        refs = [learn_ref, fps_ref]
        if not train:
            assert random_points is not None, \
                "eval needs the random query group"
            contents.append(shared)
            refs.append(inverse_sigmoid(random_points)[:, None])
        query = jnp.concatenate(contents, axis=1)  # (B, G, nq, C)
        ref = jnp.concatenate(refs, axis=1)        # (B, G, nq, 3)
        G = query.shape[1]

        cls_branches = [
            BranchMLP(self.num_classes, layer_norm=True,
                      final_bias_init=_CLS_BIAS_INIT, name=f"cls_branch{l}")
            for l in range(L)]
        reg_branches = [BranchMLP(self.code_size, name=f"reg_branch{l}")
                        for l in range(L)]
        iou_branches = [BranchMLP(1, name=f"iou_branch{l}")
                        for l in range(L)]

        decoder = Uni3DETRDecoder(
            num_layers=L, embed_dim=C, num_heads=self.num_heads,
            ffn_dim=self.ffn_dim, dropout=self.dropout, name="decoder")
        states, refs_in = decoder(query, ref, volume, reg_branches, train)

        pr = self.pc_range
        all_cls, all_box, all_iou = [], [], []
        for l in range(L):
            h = states[l].reshape(B, G * nq, C)
            r = refs_in[l].reshape(B, G * nq, 3)
            cls = cls_branches[l](h)
            tmp = reg_branches[l](h)
            iou = iou_branches[l](h)[..., 0]
            xy = jax.nn.sigmoid(tmp[..., 0:2] + r[..., 0:2])
            z = jax.nn.sigmoid(tmp[..., 4:5] + r[..., 2:3])
            cx = xy[..., 0:1] * (pr[3] - pr[0]) + pr[0]
            cy = xy[..., 1:2] * (pr[4] - pr[1]) + pr[1]
            cz = z * (pr[5] - pr[2]) + pr[2]
            box = jnp.concatenate(
                [cx, cy, tmp[..., 2:4], cz, tmp[..., 5:]], axis=-1)
            all_cls.append(cls)
            all_box.append(box)
            all_iou.append(iou)

        return {
            "all_cls_scores": jnp.stack(all_cls).astype(jnp.float32),
            "all_bbox_preds": jnp.stack(all_box).astype(jnp.float32),
            "all_iou_preds": jnp.stack(all_iou).astype(jnp.float32),
        }
